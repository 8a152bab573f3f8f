"""FAST-9/16 corner detection as dense whole-image tensor ops.

The reference's FAST_t (OpenCVModified.cpp:1225) walks pixels with SSE2/NEON and
a threshold table; the TPU-native form evaluates every pixel simultaneously:
16 shifted views of the frame, the 16 circular 9-windows reduced with min/max,
and a 3x3 strict non-max suppression — all VPU-friendly elementwise ops with
zero data-dependent control flow.

Semantics match cornerScore<16> (OpenCVModified.cpp:927-1010) exactly:
    d_k = center - circle_k
    dark  = max over 16 windows of (min over 9 contiguous d_k)
    bright = max over 16 windows of (min over 9 contiguous -d_k)
    response = max(dark, bright) - 1;    corner iff response >= threshold
(i.e. the reference's `is corner at threshold t ⟺ score_raw > t`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Bench/test hook: force the exact top_k candidate selection even when the
# default backend is TPU. Read at TRACE time — flipping it only affects calls
# that trigger a fresh trace (different shapes/devices); the bench's on-chip
# parity check uses it to trace the exact variant for CPU-resident inputs
# while the TPU executables keep the approx_max_k path.
FORCE_EXACT_TOPK = False

# Bresenham circle of radius 3 — (dx, dy), same order as OpenCV's makeOffsets
# (OpenCVModified.cpp:896-901).
CIRCLE16 = (
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
)


def _shifted(img: jax.Array, dx: int, dy: int) -> jax.Array:
    """View of img shifted so out[y, x] = img[y + dy, x + dx] (zero border).

    dy is the row offset; the circle's (dx, dy) uses image convention
    x = column, y = row with y increasing downward (matches OpenCV's
    ptr[pixel[k]] addressing of row y+dy, col x+dx).
    """
    h, w = img.shape
    pad = 3
    p = jnp.pad(img, pad)
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))


@partial(jax.jit, static_argnames=("threshold",))
def fast_score_map(img: jax.Array, threshold: int) -> jax.Array:
    """Dense FAST-9/16 response map. Non-corners and the 3px border get -1.

    Returns float32 (H, W); response semantics per module docstring.
    """
    img = img.astype(jnp.float32)
    h, w = img.shape
    # d_k = center - circle_k for all 16 circle positions. Kept as a python
    # list of (H, W) planes — stacking into (16/24, H, W) tensors forces XLA
    # to materialize hundreds of MB of intermediates per frame (measured:
    # 473 MB accessed for this function alone in the stacked form); the list
    # form fuses into a handful of passes over the frame.
    pad = 3
    p = jnp.pad(img, pad)                # pad ONCE; 16 static slices share it
    d = [img - jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))
         for (dx, dy) in CIRCLE16]
    ext = d + d[:8]                      # circular extension, 24 planes

    def window9_min(planes):
        """Sparse-table min over each contiguous window of 9: exact, with
        O(log) pairwise ops per plane instead of an 8-deep min chain."""
        m2 = [jnp.minimum(planes[i], planes[i + 1])
              for i in range(len(planes) - 1)]
        m4 = [jnp.minimum(m2[i], m2[i + 2]) for i in range(len(m2) - 2)]
        m8 = [jnp.minimum(m4[i], m4[i + 4]) for i in range(len(m4) - 4)]
        return [jnp.minimum(m8[k], planes[k + 8]) for k in range(16)]

    dark_w = window9_min(ext)
    bright_w = window9_min([-p for p in ext])
    dark = dark_w[0]
    bright = bright_w[0]
    for k in range(1, 16):
        dark = jnp.maximum(dark, dark_w[k])
        bright = jnp.maximum(bright, bright_w[k])
    score = jnp.maximum(dark, bright) - 1.0

    is_corner = score >= threshold
    # FAST is undefined within 3 px of the border (reference skips those rows/cols)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(is_corner & interior, score, -1.0)


@jax.jit
def nms3x3(score: jax.Array) -> jax.Array:
    """Strict 3x3 non-max suppression: keep score only where strictly greater
    than all 8 neighbors (FAST_t NMS, OpenCVModified.cpp:1502-1506)."""
    neg = jnp.full_like(score, -jnp.inf)
    h, w = score.shape
    p = jnp.pad(score, 1, constant_values=-jnp.inf)
    keep = jnp.ones_like(score, dtype=bool)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nb = jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))
            keep &= score > nb
    return jnp.where(keep, score, neg)


@partial(jax.jit, static_argnames=("k", "border"))
def extract_candidates(
    score: jax.Array, k: int, border: float
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k corner candidates from an NMS'd score map.

    Applies the image-border cull (RunByImageBorder, OpenCVModified.cpp:655-677:
    keep border <= x < W-border) before selection, so the fixed k slots go to
    usable corners only. Returns (xy (k,2) float32, response (k,), valid (k,)).
    """
    h, w = score.shape
    ys = jnp.arange(h)[:, None].astype(jnp.float32)
    xs = jnp.arange(w)[None, :].astype(jnp.float32)
    inb = (xs >= border) & (xs < w - border) & (ys >= border) & (ys < h - border)
    s = jnp.where(inb, score, -jnp.inf)
    flat = s.reshape(-1)
    if jax.default_backend() == "tpu" and not FORCE_EXACT_TOPK:
        # XLA lowers top_k to a full bitonic sort of the H*W map — hundreds
        # of MB of HBM passes per frame (the single largest cost in the whole
        # pipeline). The TPU PartialReduce custom op selects k of n in O(n).
        # Recall 0.99 only perturbs the weakest pre-ANMS candidates; CPU
        # (tests/oracles) keeps the exact sort.
        vals, idx = jax.lax.approx_max_k(flat, k, recall_target=0.99)
    else:
        vals, idx = jax.lax.top_k(flat, k)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    valid = vals > 0.0
    xy = jnp.stack([xx, yy], axis=-1)
    return xy, jnp.where(valid, vals, 0.0), valid
