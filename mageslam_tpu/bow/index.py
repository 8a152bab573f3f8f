"""BoW keyframe index: per-keyframe word histograms + batched similarity.

State + operations replacing OnlineBow's inverted index (m_NodeKeyframeMap)
and QueryUnknownImage/QueryFeatures. tf-idf semantics follow the reference:
node weight = IDF from training counts (OnlineBow.cpp:26-28,391-392), image
vector = L1-normalized sum of leaf weights, similarity = Σ min(q, k)
(the algebraic reduction of the reference's intersection-only L1 score,
see package docstring).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.matching import hamming_matrix


class BowIndex(NamedTuple):
    anchors: jax.Array      # (V, 8) uint32 vocabulary
    idf: jax.Array          # (V,) f32 word weights
    kf_vectors: jax.Array   # (K, V) f32 L1-normalized tf-idf histograms
    kf_has: jax.Array       # (K,) bool — keyframe present in the index
    trained: jax.Array      # () bool

    @property
    def num_words(self) -> int:
        return self.anchors.shape[0]


def empty_index(max_keyframes: int, num_words: int = 64) -> BowIndex:
    return BowIndex(
        anchors=jnp.zeros((num_words, 8), jnp.uint32),
        idf=jnp.ones((num_words,), jnp.float32),
        kf_vectors=jnp.zeros((max_keyframes, num_words), jnp.float32),
        kf_has=jnp.zeros((max_keyframes,), bool),
        trained=jnp.asarray(False),
    )


def grow_index(index: BowIndex, max_keyframes: int) -> BowIndex:
    """Pad the per-keyframe rows to a larger keyframe capacity (bucketed
    map growth, worldmap.map_state.grow_map). Vocabulary state (anchors,
    idf, trained) is keyframe-capacity-independent."""
    K = index.kf_has.shape[0]
    assert max_keyframes >= K, (K, max_keyframes)
    pad = max_keyframes - K
    if pad == 0:
        return index
    return index._replace(
        kf_vectors=jnp.pad(index.kf_vectors, ((0, pad), (0, 0))),
        kf_has=jnp.pad(index.kf_has, (0, pad)),
    )


def assign_words(index: BowIndex, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(N,) int32 word id per descriptor (FindLeafNode over the flat vocab)."""
    d = hamming_matrix(desc, index.anchors)
    return jnp.where(valid, jnp.argmin(d, axis=1).astype(jnp.int32), -1)


def image_vector(index: BowIndex, desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(V,) L1-normalized tf-idf histogram (the reference's curMap,
    OnlineBow.cpp:161-190)."""
    word = assign_words(index, desc, valid)
    V = index.num_words
    hist = jnp.zeros((V,), jnp.float32).at[
        jnp.where(valid, word, V)
    ].add(index.idf[jnp.where(valid, word, 0)] * valid, mode="drop")
    s = jnp.sum(hist)
    return hist / jnp.where(s > 0, s, 1.0)


def compute_idf(index: BowIndex, training_desc: jax.Array,
                training_valid: jax.Array) -> BowIndex:
    """IDF from the training pool: weight = ln(N_total / N_word)
    (OnlineBow's trained node weights)."""
    word = assign_words(index, training_desc, training_valid)
    V = index.num_words
    counts = jnp.zeros((V,), jnp.float32).at[
        jnp.where(training_valid, word, V)
    ].add(1.0, mode="drop")
    total = jnp.maximum(jnp.sum(counts), 1.0)
    idf = jnp.log(total / jnp.maximum(counts, 1.0))
    # words never seen in training get the max weight
    idf = jnp.where(counts > 0, idf, jnp.log(total))
    return index._replace(idf=idf)


def add_keyframe(index: BowIndex, slot: jax.Array, desc: jax.Array,
                 valid: jax.Array) -> BowIndex:
    """OnlineBow::AddImage — record the keyframe's histogram."""
    vec = image_vector(index, desc, valid)
    ok = slot >= 0
    s = jnp.where(ok, slot, 0)
    return index._replace(
        kf_vectors=index.kf_vectors.at[s].set(
            jnp.where(ok, vec, index.kf_vectors[s])),
        kf_has=index.kf_has.at[s].max(ok),
    )


def retrain_index(
    index: BowIndex,
    pool_desc: jax.Array,      # (M, 8) uint32 accumulated training descriptors
    pool_valid: jax.Array,     # (M,) bool
    kf_desc: jax.Array,        # (K, N, 8) keyframe descriptor bank
    kf_kp_valid: jax.Array,    # (K, N) bool
    kf_has: jax.Array,         # (K,) bool — keyframes currently indexed
    key: jax.Array,
    iterations: int = 12,
) -> BowIndex:
    """Online vocabulary (re)training from the full accumulated pool
    (OnlineBow::CreateVocabularyTree, OnlineBow.cpp:454-587: the reference
    accumulates descriptors over the first TrainingFrames=15 frames —
    ≥MinTrainingSize — then trains once). Every indexed keyframe's histogram
    is recomputed under the new vocabulary, the analogue of the reference
    building its inverted index after training. One jitted dispatch."""
    from .vocab import train_vocabulary

    anchors = train_vocabulary(pool_desc, pool_valid, key,
                               num_words=index.num_words,
                               iterations=iterations)
    index = index._replace(anchors=anchors, trained=jnp.asarray(True))
    index = compute_idf(index, pool_desc, pool_valid)
    vecs = jax.vmap(lambda d, v: image_vector(index, d, v))(
        kf_desc, kf_kp_valid)
    return index._replace(
        kf_vectors=jnp.where(kf_has[:, None], vecs, index.kf_vectors))


retrain_index_jit = jax.jit(retrain_index, static_argnames=("iterations",))


def remove_keyframes(index: BowIndex, removed: jax.Array) -> BowIndex:
    """Drop culled keyframes from the index."""
    return index._replace(kf_has=index.kf_has & jnp.logical_not(removed))


def query_keyframes(
    index: BowIndex, desc: jax.Array, valid: jax.Array,
    exclude: jax.Array | None = None,
    qualifying_score: float = 0.75,
) -> tuple[jax.Array, jax.Array]:
    """QueryUnknownImage (OnlineBow.cpp:153-260): similarity of the query
    image against every indexed keyframe at once.

    Returns (scores (K,), qualified (K,) bool) where qualified keeps
    keyframes scoring ≥ maxScore · QualifyingCandidateScore
    (BagOfWordsSettings.QualifyingCandidateScore, MageSettings.h:226)."""
    q = image_vector(index, desc, valid)                     # (V,)
    scores = jnp.sum(jnp.minimum(index.kf_vectors, q[None, :]), axis=1)
    ok = index.kf_has
    if exclude is not None:
        ok = ok & jnp.logical_not(exclude)
    scores = jnp.where(ok, scores, 0.0)
    max_score = jnp.max(scores)
    qualified = ok & (scores >= max_score * qualifying_score) & (max_score > 0)
    return scores, qualified
