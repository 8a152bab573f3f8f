"""Feature selection: RetainBestFeatures + Adaptive Non-Maximal Suppression.

The reference's ANMS (OpenCVModified.cpp:144-360) computes, per keypoint, the
squared distance to the nearest *stronger* keypoint (strength scaled by an
adaptive robustness factor), using a grid + intrusive lists to prune the CPU
search; it then keeps the numToKeep keypoints with the largest suppression
radius. On TPU the grid is pointless: the all-pairs (K,K) distance matrix is a
single fused VPU pass at K≈1-2k, giving the *exact* same radii.

RetainBestFeatures (OpenCVModified.cpp:571-613) is a histogram threshold dance
over u8-clamped responses; reproduced bin-exactly below on the sorted candidate
list (top_k already gives descending responses).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ROBUST_EPS = 0.002  # OpenCVModified.cpp:157


@partial(jax.jit, static_argnames=("min_num", "max_num", "min_threshold"))
def retain_best_features(
    response: jax.Array,
    valid: jax.Array,
    min_num: int,
    max_num: int,
    min_threshold: int,
    response_factor: float,
) -> jax.Array:
    """Returns an updated valid mask. `response` must be sorted descending
    (invalid entries at the end), as produced by fast.extract_candidates.

    Bin semantics: responses are u8-clamped ints; thresholds select whole bins,
    so ties at the cut survive together (matching the histogram loop).
    """
    r_int = jnp.clip(response, 0.0, 255.0).astype(jnp.int32)
    r_int = jnp.where(valid, r_int, -1)
    n_valid = jnp.sum(valid.astype(jnp.int32))
    k = response.shape[0]

    # minNumThreshold: the bin where cumulative count (from 255 down) reaches
    # min_num — i.e. the bin of the min_num-th strongest — but never below
    # min_threshold, and min_threshold if there aren't min_num features at all.
    idx_min = jnp.minimum(min_num - 1, jnp.maximum(n_valid - 1, 0))
    bin_at_min = r_int[idx_min]
    have_min = (n_valid >= min_num) & (bin_at_min >= min_threshold)
    min_num_threshold = jnp.where(have_min, bin_at_min, min_threshold)

    thr2 = jnp.maximum(
        (min_num_threshold.astype(jnp.float32) * response_factor).astype(jnp.int32),
        min_threshold,
    )

    # early-break bin: all of the bin containing the max_num-th item survives
    idx_max = jnp.minimum(max_num - 1, jnp.maximum(n_valid - 1, 0))
    bin_stop = jnp.where(n_valid > max_num, r_int[idx_max], 0)

    cut = jnp.maximum(thr2, bin_stop)
    return valid & (r_int >= cut)


@partial(
    jax.jit,
    static_argnames=(
        "num_to_keep",
        "fast_threshold",
        "strong_response",
        "min_robustness",
        "max_robustness",
    ),
)
def adaptive_nms(
    xy: jax.Array,
    response: jax.Array,
    valid: jax.Array,
    num_to_keep: int,
    fast_threshold: int,
    strong_response: int,
    min_robustness: float,
    max_robustness: float,
) -> jax.Array:
    """Exact ANMS radii via the dense pair matrix; returns updated valid mask
    with at most num_to_keep survivors (all survivors if fewer candidates).

    xy: (K, 2) integer-valued pixel coords, response: (K,), valid: (K,).
    """
    k = xy.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))

    x = jnp.where(valid, xy[..., 0], 0.0).astype(jnp.int32)
    y = jnp.where(valid, xy[..., 1], 0.0).astype(jnp.int32)
    strength = jnp.where(valid, response, 0.0)

    big = jnp.int32(2**30)
    minx = jnp.min(jnp.where(valid, x, big))
    maxx = jnp.max(jnp.where(valid, x, -big))
    miny = jnp.min(jnp.where(valid, y, big))
    maxy = jnp.max(jnp.where(valid, y, -big))
    min_strength = jnp.min(jnp.where(valid, strength, jnp.inf))

    # adaptive robustness factor (OpenCVModified.cpp:204-215)
    rng = jnp.maximum(0.0, max_robustness - min_robustness)
    denom = float(strong_response - fast_threshold)
    val = jnp.clip(min_strength - fast_threshold, 0.0, denom)
    rf = max_robustness - (val / denom) * rng

    global_max_r2 = (
        ((maxx - minx).astype(jnp.float32))
        * (maxy - miny).astype(jnp.float32)
        / num_to_keep
    ).astype(jnp.int32)

    # all-pairs suppression radii: r_i = min dist² to j with strength_j > s_i
    s = strength * rf + ROBUST_EPS  # FAST responses are non-negative
    dx = x[:, None] - x[None, :]
    dy = y[:, None] - y[None, :]
    d2 = dx * dx + dy * dy
    stronger = (strength[None, :] > s[:, None]) & valid[None, :]
    d2 = jnp.where(stronger, d2, big)
    r = jnp.minimum(jnp.min(d2, axis=1), global_max_r2)

    # select top num_to_keep by (r desc, strength desc, idx asc) — composite key;
    # r <= global_max_r2 (small) and strength <= 255, both integers, so the key
    # is exact in f32.
    key = r.astype(jnp.float32) * 16384.0 + strength
    key = jnp.where(valid, key, -jnp.inf)
    _, top_idx = jax.lax.top_k(key, min(num_to_keep, k))
    keep = jnp.zeros((k,), bool).at[top_idx].set(True)
    keep &= valid

    # reference skips ANMS when numToKeep > candidate count (keep everything)
    return jnp.where(n_valid <= num_to_keep, valid, keep)


@partial(jax.jit, static_argnames=("num_to_keep", "grid_w", "grid_h"))
def spatial_select(
    xy: jax.Array,
    response: jax.Array,
    valid: jax.Array,
    num_to_keep: int,
    image_width: int,
    image_height: int,
    grid_w: int = 8,
    grid_h: int = 6,
) -> jax.Array:
    """Spatially-uniform budget selection (EXTENSION — see
    config.FeatureExtractorSettings.SpatialFeatureSelection).

    Candidates are ranked per grid cell by response, then selected globally by
    the composite key (rank-in-cell ascending, response descending): every
    cell's strongest candidate outranks any cell's second-strongest, so the
    budget round-robins across textured cells regardless of absolute contrast.
    Empty cells donate their share to the next ranks — coverage degrades to
    plain response order, never below it. One all-pairs pass + one top_k:
    the same TPU shape as the exact ANMS above.
    """
    k = xy.shape[0]
    n_valid = jnp.sum(valid.astype(jnp.int32))
    gx = jnp.clip((xy[:, 0] * grid_w / image_width).astype(jnp.int32), 0, grid_w - 1)
    gy = jnp.clip((xy[:, 1] * grid_h / image_height).astype(jnp.int32), 0, grid_h - 1)
    cell = jnp.where(valid, gx + gy * grid_w, -1)

    # rank within cell: number of strictly-better same-cell candidates
    # (response desc, index asc tiebreak — a total order, so ranks are unique)
    resp = jnp.where(valid, response, -jnp.inf)
    idx = jnp.arange(k)
    better = (resp[None, :] > resp[:, None]) | (
        (resp[None, :] == resp[:, None]) & (idx[None, :] < idx[:, None])
    )
    same_cell = (cell[None, :] == cell[:, None]) & valid[None, :] & valid[:, None]
    rank_in_cell = jnp.sum((same_cell & better).astype(jnp.int32), axis=1)

    # composite key, exact in f32: rank < k <= 2048, response u8-clamped
    key = -rank_in_cell.astype(jnp.float32) * 1024.0 + jnp.clip(resp, 0.0, 255.0)
    key = jnp.where(valid, key, -jnp.inf)
    _, top_idx = jax.lax.top_k(key, min(num_to_keep, k))
    keep = jnp.zeros((k,), bool).at[top_idx].set(True)
    return jnp.where(n_valid <= num_to_keep, valid, keep & valid)
