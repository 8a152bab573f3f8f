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
    # d_k = center - circle_k for all 16 circle positions: (16, H, W)
    d = jnp.stack([img - _shifted(img, dx, dy) for (dx, dy) in CIRCLE16])

    # circular windows of 9: window k covers d[k..k+8]
    d2 = jnp.concatenate([d, d[:8]], axis=0)  # (24, H, W)
    # running min/max over 9 via a tree of 8 pairwise ops per position would be
    # ideal; unrolled min-chain is fine (static, XLA fuses it).
    dark_min = d2[:16]
    bright_min = -d2[:16]
    for i in range(1, 9):
        dark_min = jnp.minimum(dark_min, d2[i : i + 16])
        bright_min = jnp.minimum(bright_min, -d2[i : i + 16])
    dark = jnp.max(dark_min, axis=0)
    bright = jnp.max(bright_min, axis=0)
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
    vals, idx = jax.lax.top_k(flat, k)
    yy = (idx // w).astype(jnp.float32)
    xx = (idx % w).astype(jnp.float32)
    valid = vals > 0.0
    xy = jnp.stack([xx, yy], axis=-1)
    return xy, jnp.where(valid, vals, 0.0), valid
