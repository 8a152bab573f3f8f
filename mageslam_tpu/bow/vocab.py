"""Online vocabulary training: batched Hamming k-medoid.

The reference trains its tree with k-means/k-medoid over training descriptors
accumulated from the first ~15 frames (OnlineBow::CreateVocabularyTree,
OnlineBow.cpp:454-587, gated by BagOfWordsSettings: TrainingFrames=15,
MaxTrainingIteration=12, MinTrainingSize=1000). Here the flat vocabulary is
trained the same way — k-medoid keeps centers as real descriptors so
assignment stays a pure Hamming computation:

  assign: word(d) = argmin_v popcount(d ^ anchor_v)       (one (N, V) matrix)
  update: anchor_v = bitwise majority of member descriptors (256 bit votes)

Majority-vote update is the binary-space analog of the mean; it is exactly
what DBoW-style binary vocabularies use.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.matching import hamming_matrix


def _majority_descriptor(desc: jax.Array, member: jax.Array) -> jax.Array:
    """Bitwise majority over member descriptors. desc (N, 8) uint32,
    member (N,) bool → (8,) uint32."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)  # (N, 8, 32)
    w = member.astype(jnp.int32)
    votes = jnp.sum(bits.astype(jnp.int32) * w[:, None, None], axis=0)  # (8, 32)
    count = jnp.maximum(jnp.sum(w), 1)
    maj = (votes * 2 >= count).astype(jnp.uint32)
    return jnp.sum(maj << shifts[None, :], axis=1, dtype=jnp.uint32)


@partial(jax.jit, static_argnames=("num_words", "iterations"))
def train_vocabulary(
    descriptors: jax.Array,   # (N, 8) uint32 training pool
    valid: jax.Array,         # (N,) bool
    key: jax.Array,
    num_words: int = 64,
    iterations: int = 12,     # MaxTrainingIteration (MageSettings.h:231)
) -> jax.Array:
    """Returns (num_words, 8) uint32 anchor descriptors."""
    N = descriptors.shape[0]
    # init: random distinct valid descriptors (gumbel top-k over validity)
    g = jax.random.gumbel(key, (N,)) + jnp.where(valid, 0.0, -1e9)
    init_idx = jnp.argsort(-g)[:num_words]
    anchors = descriptors[init_idx]

    def step(anchors, _):
        d = hamming_matrix(descriptors, anchors)            # (N, V)
        d = jnp.where(valid[:, None], d, 1 << 20)
        word = jnp.argmin(d, axis=1)                        # (N,)
        member = jax.nn.one_hot(word, num_words, dtype=bool) & valid[:, None]

        new_anchors = jax.vmap(
            lambda m: _majority_descriptor(descriptors, m), in_axes=1
        )(member)
        # empty clusters keep their anchor
        has = jnp.any(member, axis=0)
        anchors = jnp.where(has[:, None], new_anchors, anchors)
        return anchors, None

    anchors, _ = jax.lax.scan(step, anchors, None, length=iterations)
    return anchors
