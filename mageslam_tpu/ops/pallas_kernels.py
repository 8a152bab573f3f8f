"""Pallas TPU kernels for the hottest matcher op.

The rest of the framework leans on XLA fusion (which already reaches memory
bandwidth on the frontend's elementwise pipelines); the binary-descriptor
distance matrix is the one op with enough arithmetic density and a
non-fusible inner structure (XOR → popcount → reduce over words) to justify a
hand kernel. Layout per the TPU tiling rules (pallas guide): operands are
kept in VMEM, the grid tiles the (N, M) output into 128×256 blocks aligned to
the 8×128 f32 / int32 lane structure, and each block accumulates the 8
descriptor words with SWAR popcounts on the VPU.

`hamming_matrix_pallas` is a drop-in for ops.matching.hamming_matrix; the
wrapper falls back to the jnp path off-TPU (tests run it in interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_N = 128
BLOCK_M = 256


def _popcount32(v):
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _hamming_kernel(a_ref, b_ref, out_ref):
    """One (BLOCK_N, BLOCK_M) output tile: a_ref (BLOCK_N, 8) u32,
    b_ref (BLOCK_M, 8) u32."""
    acc = jnp.zeros((BLOCK_N, BLOCK_M), jnp.int32)
    for k in range(8):                      # descriptor words, unrolled
        av = a_ref[:, k]                    # (BLOCK_N,)
        bv = b_ref[:, k]                    # (BLOCK_M,)
        x = av[:, None] ^ bv[None, :]       # (BLOCK_N, BLOCK_M) u32
        acc = acc + _popcount32(x)
    out_ref[:, :] = acc


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("interpret",))
def hamming_matrix_pallas(desc_a: jax.Array, desc_b: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """(N, M) int32 Hamming distances between (·, 8) uint32 descriptor banks."""
    N, M = desc_a.shape[0], desc_b.shape[0]
    Np = -(-N // BLOCK_N) * BLOCK_N
    Mp = -(-M // BLOCK_M) * BLOCK_M
    a = _pad_to(desc_a, Np, 0)
    b = _pad_to(desc_b, Mp, 0)

    out = pl.pallas_call(
        _hamming_kernel,
        grid=(Np // BLOCK_N, Mp // BLOCK_M),
        in_specs=[
            pl.BlockSpec((BLOCK_N, 8), lambda i, j: (i, 0)),
            pl.BlockSpec((BLOCK_M, 8), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, BLOCK_M), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), jnp.int32),
        interpret=interpret,
    )(a, b)
    return out[:N, :M]
