"""Pose estimation: motion-model prior + guided matching against history frames.

Replaces Tracking/PoseEstimator.{h,cpp}:
  - `estimate_next_pose_from_history` — constant-velocity extrapolation of the
    two extreme history poses (EstimateNextPoseFromHistory,
    PoseEstimator.cpp:89-133; the golden path's MotionModelPriorProvider)
  - `estimate_pose_with_prior` — project the history frames' map points with
    the prior pose and run the 3-radius guided match cascade 12→24→36 px
    (TryEstimatePoseFromKeyframe, PoseEstimator.cpp:439-607). The third,
    widest search centers on the reference keypoints' own positions, not the
    projections (the `nullptr` predictedPositions call at :568-580).

On TPU the per-point loops become whole-bank ops: all H×N history associations
project at once; deduplication keeps the newest frame's observation of each
map point; each cascade stage is one masked distance-matrix radius match.
The relocalization path (BoW candidates + PnP-RANSAC) lives in `relocalization`.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, interpolate_pose
from ..ops.matching import dedup_by_target
from .frame_state import TrackedFrame, TrackingHistory

_BIG = jnp.int32(1 << 20)

# trace-time debug switch (see worldmap/new_points.py): guided-cascade stage
# counts via jax.debug.print, zero cost when unset
_DEBUG = bool(os.environ.get("MAGESLAM_DEBUG_TRACKING"))


def estimate_next_pose_from_history(history: TrackingHistory,
                                    next_time: jax.Array) -> Pose:
    """Constant-velocity prior: extrapolate from oldest→newest history poses
    to `next_time` (PoseEstimator.cpp:89-133: slerp delta rotation + lerp
    translation, scaled by the time ratio)."""
    n_valid = jnp.sum(history.valid.astype(jnp.int32))
    newest = Pose(history.poses.R[0], history.poses.t[0])
    oldest_idx = jnp.maximum(n_valid - 1, 0)
    oldest = Pose(history.poses.R[oldest_idx], history.poses.t[oldest_idx])

    dt_hist = history.timestamps[0] - history.timestamps[oldest_idx]
    dt_next = next_time - history.timestamps[0]
    ratio = jnp.where(dt_hist > 1e-6, dt_next / dt_hist, 0.0)

    # interpolate_pose(older, newer, 1 + ratio) extrapolates past the newer pose
    predicted = interpolate_pose(oldest, newest, 1.0 + ratio)
    single = n_valid <= 1
    return Pose(
        jnp.where(single, newest.R, predicted.R),
        jnp.where(single, newest.t, predicted.t),
    )


class GuidedMatchResult(NamedTuple):
    assoc: jax.Array        # (N,) int32 — per current-frame keypoint, map point slot or -1
    match_count: jax.Array  # () int32
    succeeded: jax.Array    # () bool


def estimate_pose_with_prior(
    frame: TrackedFrame,
    history: TrackingHistory,
    mp_pos: jax.Array,           # (P, 3) map point positions
    mp_valid: jax.Array,         # (P,) bool
    mp_refine_count: jax.Array,  # (P,) int32
    minimum_feature_matches: int = 15,
    search_radius: float = 12.0,
    wider_search_radius: float = 24.0,
    extra_wider_search_radius: float = 36.0,
    small_match_ratio: float = 0.333780871615353,
    max_hamming: int = 45,
    min_hamming_diff: int = 8,
    min_refinement_count: int = 0,
    use_mxu: bool = True,
    candidate_budget: int = 1024,
) -> GuidedMatchResult:
    """The prior tracking path. `frame.pose` must already hold the prior.

    Candidate set: every map point associated in any history frame (newest
    occurrence wins), refined ≥ min_refinement_count, projecting in front of
    the camera. The wider cascade stages execute (lax.cond) only when the
    previous stage found too few matches (matchCount < min or accuracy <
    ratio), mirroring the reference's early-outs.
    """
    H, N = history.assoc.shape
    P = mp_valid.shape[0]

    # ---- flatten history associations, newest frame first (dedup: first wins) ----
    flat_assoc = history.assoc.reshape(-1)                           # (H*N,)
    flat_xy = history.kp_xy.reshape(-1, 2)
    flat_desc = history.desc.reshape(-1, 8)
    frame_valid = jnp.repeat(history.valid, N)
    a_ok = (flat_assoc >= 0) & frame_valid
    a_safe = jnp.where(a_ok, flat_assoc, 0)
    a_ok = a_ok & mp_valid[a_safe] & (mp_refine_count[a_safe] >= min_refinement_count)

    # dedup by map point: keep the first (newest-frame) occurrence
    order = jnp.arange(H * N, dtype=jnp.int32)
    first_occurrence = jnp.full((P,), _BIG, jnp.int32).at[a_safe].min(
        jnp.where(a_ok, order, _BIG)
    )
    is_first = a_ok & (first_occurrence[a_safe] == order)

    # ---- project candidate points with the prior pose ----
    pts = mp_pos[a_safe]                                             # (H*N, 3)
    Xc = frame.pose.transform(pts)
    z = Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = frame.cam[0] * Xc[:, 0] * inv_z + frame.cam[2]
    v = frame.cam[1] * Xc[:, 1] * inv_z + frame.cam[3]
    predicted = jnp.stack([u, v], axis=-1)
    cand = is_first & (z >= 0)                                       # Distance >= 0 gate
    n_candidates = jnp.sum(cand.astype(jnp.int32))

    # query octave = the observing history keypoint's pyramid level; the
    # cascade matches SAME-octave targets only (the reference's spatial index
    # stores octave·100 as a 3rd coordinate and queries ±1,
    # KeypointSpatialIndex.h:36-37 / PoseEstimator.cpp:502-591)
    q_oct = history.octave.reshape(-1)

    # compact the deduped candidate set to a fixed budget (≤ one frame's
    # features per history slot survive dedup, so the budget is generous),
    # then ONE (budget, N) Hamming matrix shared by all three cascade stages —
    # only the spatial mask differs per stage
    from ..ops.matching import BIG as _MBIG, _best_and_second, hamming_matrix

    Cb = min(candidate_budget, cand.shape[0])
    # compaction key: validity, ties broken low-index-first (top_k's order);
    # TPU routes through PartialReduce instead of a full bitonic sort
    key = cand.astype(jnp.float32) * 2.0 - jnp.arange(
        cand.shape[0], dtype=jnp.float32) / cand.shape[0]
    if jax.default_backend() == "tpu":
        _, sel = jax.lax.approx_max_k(key, Cb, recall_target=0.99)
    else:
        _, sel = jax.lax.top_k(key, Cb)
    sel = sel.astype(jnp.int32)
    cand_c = cand[sel]
    flat_desc_c = flat_desc[sel]
    flat_xy_c = flat_xy[sel]
    predicted_c = predicted[sel]
    a_safe_c = a_safe[sel]
    q_oct_c = q_oct[sel]

    dmat = hamming_matrix(flat_desc_c, frame.desc, use_mxu=use_mxu)
    same_oct = q_oct_c[:, None] == frame.kp_octave[None, :]
    dmat = jnp.where(cand_c[:, None] & same_oct & frame.kp_valid[None, :],
                     dmat, _MBIG)

    def stage(q_xy, radius):
        dx = jnp.abs(q_xy[:, None, 0] - frame.kp_xy[None, :, 0])
        dy = jnp.abs(q_xy[:, None, 1] - frame.kp_xy[None, :, 1])
        in_box = (dx <= radius) & (dy <= radius)
        d = jnp.where(in_box, dmat, _MBIG)
        best_idx, best_val, second_val = _best_and_second(d)
        m_ok = (best_val <= max_hamming) & (
            (second_val >= _MBIG) | (second_val - best_val > min_hamming_diff))
        idx = jnp.where(m_ok, best_idx, -1)
        idx = dedup_by_target(idx, jnp.where(m_ok, best_val, -1))
        return idx, jnp.sum((idx >= 0).astype(jnp.int32))

    denom = jnp.maximum(n_candidates.astype(jnp.float32), 1.0)

    def stage_ok(n):
        return (n >= minimum_feature_matches) & (
            n.astype(jnp.float32) / denom >= small_match_ratio)

    # the wider stages only run when the narrow search came up short — in
    # steady tracking that is rare, so they live behind lax.cond (only the
    # taken branch executes on TPU), matching the reference's early-outs
    idx1, n1 = stage(predicted_c, search_radius)

    def wider(_):
        idx2, n2 = stage(predicted_c, wider_search_radius)

        def widest(_):
            return stage(flat_xy_c, extra_wider_search_radius)  # own positions

        return jax.lax.cond(stage_ok(n2), lambda _: (idx2, n2), widest,
                            operand=None)

    idx, count = jax.lax.cond(stage_ok(n1), lambda _: (idx1, n1), wider,
                              operand=None)

    # invert: per current-frame keypoint, which map point (indices are within
    # the compacted candidate set)
    has = idx >= 0
    t_safe = jnp.where(has, idx, 0)
    assoc = jnp.full((N,), -1, jnp.int32).at[t_safe].max(
        jnp.where(has, a_safe_c, -1)
    )
    ok = count >= minimum_feature_matches
    assoc = jnp.where(ok, assoc, -1)
    if _DEBUG:
        hist_assoc = jnp.sum(((history.assoc[0] >= 0)
                              & history.valid[0]).astype(jnp.int32))
        jax.debug.print(
            "PEDBG hist0={h} dedup_pool={d} cand_inview={c} n1={n1} final={n}",
            h=hist_assoc, d=jnp.sum(is_first.astype(jnp.int32)),
            c=n_candidates, n1=n1, n=count)
    return GuidedMatchResult(assoc=assoc, match_count=count, succeeded=ok)
