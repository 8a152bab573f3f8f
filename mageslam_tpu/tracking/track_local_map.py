"""Track-local-map: two-stage pose-only optimization with guided re-association.

Replaces Tracking/TrackLocalMap.{h,cpp} (RunTrackLocalMap, TrackLocalMap.cpp:
37-330):

  stage 1: pose-only LM on current associations, unassociate outliers
  gather : project every un-associated covisible map point into the frame,
           gate by IsGoodCandidate (in front + in border + view-angle < 60° +
           dMin/dMax scale range, TrackLocalMap.cpp:519-555), predict its
           octave (MappingMath.h ComputeOctave), radius-match its
           representative descriptor against unassociated keypoints
  stage 2: pose-only LM on the merged association set, unassociate outliers,
           fail if tracked features < MinTrackedFeatureCount

Recent-map-point scoring (found/predicted counters driving
CullRecentMapPoints' 25% rule, TrackLocalMap.cpp:68-86 + :560-575) is
returned as per-point count deltas on the full point bank.

TPU shape: the per-point loop over covisible keyframes' points becomes one
masked pass over the whole point bank; candidate matching is one (P, N)
distance matrix.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.pose_only import optimize_pose
from ..geometry.se3 import Pose
from ..ops.matching import dedup_by_target, radius_match
from ..worldmap.map_state import MapState, predict_octave
from .frame_state import TrackedFrame

# trace-time debug switch (see worldmap/new_points.py): per-call stage counts
# via jax.debug.print, zero cost when unset
_DEBUG = bool(os.environ.get("MAGESLAM_DEBUG_TRACKING"))


class TrackLocalMapResult(NamedTuple):
    frame: TrackedFrame          # updated pose + associations
    succeeded: jax.Array         # () bool
    found_delta: jax.Array       # (P,) int32 — mp_found increments
    predicted_delta: jax.Array   # (P,) int32 — mp_predicted increments
    tracked_count: jax.Array     # () int32


def _pose_only(frame: TrackedFrame, mp_pos, info_mask, num_iters, huber, max_err_sq):
    """One OptimizeCameraPose pass (TrackLocalMap.cpp:421-…): LM on the
    associated points, then outlier flags by unweighted squared error and
    cheirality (BundlerLib.cpp:388-436)."""
    assoc_ok = info_mask
    safe = jnp.where(frame.assoc >= 0, frame.assoc, 0)
    pts = mp_pos[safe]
    info = jnp.where(assoc_ok, 1.0, 0.0)
    pose, chi2, depth = optimize_pose(
        frame.pose, frame.cam, pts, frame.kp_xy, info,
        huber_width=huber, num_iters=num_iters,
    )
    outlier = assoc_ok & ((chi2 > max_err_sq) | (depth <= 0.0))
    return pose, outlier


def track_local_map(
    frame: TrackedFrame,
    state: MapState,
    candidate_points: jax.Array,     # (P,) bool — points of covisible keyframes
    num_levels: int,
    pyramid_scale: float,
    image_width: float = 320.0,
    image_height: float = 180.0,
    image_border: float = 7.5,       # PatchSize/2 (MageSettings.h:166)
    min_degrees_view_angle: float = 60.0,
    match_search_radius: float = 8.0,
    max_hamming: int = 45,
    min_hamming_diff: int = 8,
    min_refinement_count: int = 0,
    stage1_iters: int = 4,           # InitialPoseEstimateBundleAdjustmentSteps
    stage2_iters: int = 10,          # BundleAdjustmentG2OSteps
    stage1_huber: float = 2.0,       # InitialPoseEstimateBundleAdjustmentHuberWidth
    stage2_huber: float = 1.0,       # BundleAdjustmentHuberWidth
    max_outlier_error_pose_estimation: float = 4.0,
    max_outlier_error: float = 2.2,
    min_tracked_features: int = 20,
    score_recent_points: bool = True,
    use_mxu: bool = True,            # MXU bit-matmul for the (P, N) Hamming matrix
    candidate_budget: int = 2048,    # compaction cap on predicted candidates
) -> TrackLocalMapResult:
    P = state.mp_valid.shape[0]
    N = frame.kp_xy.shape[0]
    recent_window = 3
    age = (state.next_order - 1) - state.mp_created_order
    is_recent = state.mp_valid & (age >= 0) & (age <= recent_window)

    found = jnp.zeros((P,), jnp.int32)
    predicted = jnp.zeros((P,), jnp.int32)

    # drop stale associations to invalid/removed points up front — everything
    # downstream (counts, optimization, success gate) must only see live points
    pre_ok = (frame.assoc >= 0) & frame.kp_valid
    pre_safe = jnp.where(pre_ok, frame.assoc, 0)
    frame = frame._replace(
        assoc=jnp.where(pre_ok & state.mp_valid[pre_safe], frame.assoc, -1)
    )

    # initial associations: found & predicted (TrackLocalMap.cpp:69-83)
    a_ok0 = (frame.assoc >= 0) & frame.kp_valid
    safe0 = jnp.where(a_ok0, frame.assoc, 0)
    a_ok0 = a_ok0 & state.mp_valid[safe0]
    init_seen = jnp.zeros((P,), jnp.int32).at[safe0].add(a_ok0.astype(jnp.int32))
    found = found + init_seen
    predicted = predicted + init_seen

    # ---- stage 1 ----
    pose1, outlier1 = _pose_only(
        frame, state.mp_pos, a_ok0, stage1_iters, stage1_huber,
        max_outlier_error_pose_estimation ** 2,
    )
    # unassociate outliers; decrement their found score
    out_safe = jnp.where(outlier1, frame.assoc, 0)
    found = found - jnp.zeros((P,), jnp.int32).at[out_safe].add(outlier1.astype(jnp.int32))
    assoc1 = jnp.where(outlier1, -1, frame.assoc)
    frame = frame._replace(pose=pose1, assoc=assoc1)

    # ---- gather candidates over the whole point bank ----
    a_ok1 = (frame.assoc >= 0) & frame.kp_valid
    safe1 = jnp.where(a_ok1, frame.assoc, 0)
    already = jnp.zeros((P,), bool).at[safe1].max(a_ok1)

    cand = (
        candidate_points
        & state.mp_valid
        & jnp.logical_not(already)
        & (state.mp_refine_count >= min_refinement_count)
    )

    # IsGoodCandidate gates
    Xc = pose1.transform(state.mp_pos)                      # (P, 3)
    z = Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = frame.cam[0] * Xc[:, 0] * inv_z + frame.cam[2]
    v = frame.cam[1] * Xc[:, 1] * inv_z + frame.cam[3]
    width = jnp.float32(image_width)
    height = jnp.float32(image_height)
    in_border = (
        (u >= image_border) & (u < width - image_border)
        & (v >= image_border) & (v < height - image_border)
    )
    center = pose1.center()
    forward = pose1.forward()
    cos_angle = jnp.einsum("pi,i->p", state.mp_mean_dir, forward)
    angle_ok = cos_angle >= jnp.cos(jnp.deg2rad(jnp.float32(min_degrees_view_angle)))
    delta = state.mp_pos - center[None, :]
    dist_sq = jnp.sum(delta * delta, axis=-1)
    range_ok = (dist_sq >= state.mp_dmin**2) & (dist_sq <= state.mp_dmax**2)
    good = cand & (z >= 0) & in_border & angle_ok & range_ok

    octv = predict_octave(jnp.sqrt(jnp.maximum(dist_sq, 1e-12)),
                          state.mp_dmin, pyramid_scale)
    oct_ok = (octv >= 0) & (octv <= num_levels)
    is_predicted = good & oct_ok
    predicted = predicted + (is_predicted & is_recent).astype(jnp.int32)

    # ---- match candidates to unassociated keypoints ----
    # compact the predicted candidates to a fixed budget before the Hamming
    # matrix: the active predicted set is far smaller than the point bank, so
    # a (budget, N) matrix replaces the (P, N) one (nearest candidates win
    # slots on overflow)
    unassociated = frame.kp_valid & (frame.assoc < 0)
    proj_xy = jnp.stack([u, v], axis=-1)
    C = min(candidate_budget, P)
    # top_k, not argsort: full sorts are slow on TPU (bitonic over P lanes);
    # on TPU use the PartialReduce custom op — selection only decides which
    # predicted candidates win budget slots on overflow (rare)
    prio = jnp.where(is_predicted, -dist_sq, -jnp.inf)
    if jax.default_backend() == "tpu":
        _, cand_idx = jax.lax.approx_max_k(prio, C, recall_target=0.99)
    else:
        _, cand_idx = jax.lax.top_k(prio, C)
    cand_idx = cand_idx.astype(jnp.int32)
    cand_ok = is_predicted[cand_idx]
    m_idx_c, m_dist_c = radius_match(
        state.mp_desc[cand_idx], proj_xy[cand_idx],
        jnp.clip(octv, 0, num_levels - 1)[cand_idx], cand_ok,
        frame.desc, frame.kp_xy, frame.kp_octave, unassociated,
        jnp.float32(match_search_radius), jnp.int32(max_hamming),
        jnp.int32(min_hamming_diff), use_mxu=use_mxu,
    )
    m_idx_c = dedup_by_target(m_idx_c, m_dist_c)
    matched_c = m_idx_c >= 0
    # scatter results back to the full point domain
    m_idx = jnp.full((P,), -1, jnp.int32).at[cand_idx].set(m_idx_c)
    matched = jnp.zeros((P,), bool).at[cand_idx].max(matched_c)
    found = found + (matched & is_recent).astype(jnp.int32)

    # write new associations: keypoint m_idx[p] ← point p
    t_safe = jnp.where(matched, m_idx, 0)
    new_assoc = jnp.full((N,), -1, jnp.int32).at[t_safe].max(
        jnp.where(matched, jnp.arange(P, dtype=jnp.int32), -1)
    )
    assoc2 = jnp.where((frame.assoc < 0) & (new_assoc >= 0), new_assoc, frame.assoc)
    frame = frame._replace(assoc=assoc2)

    # ---- stage 2 ----
    a_ok2 = (frame.assoc >= 0) & frame.kp_valid
    safe2 = jnp.where(a_ok2, frame.assoc, 0)
    a_ok2 = a_ok2 & state.mp_valid[safe2]
    pose2, outlier2 = _pose_only(
        frame, state.mp_pos, a_ok2, stage2_iters, stage2_huber,
        max_outlier_error ** 2,
    )
    out_safe2 = jnp.where(outlier2, frame.assoc, 0)
    found = found - jnp.zeros((P,), jnp.int32).at[out_safe2].add(outlier2.astype(jnp.int32))
    assoc3 = jnp.where(outlier2, -1, frame.assoc)
    frame = frame._replace(pose=pose2, assoc=assoc3)

    tracked = jnp.sum(((assoc3 >= 0) & frame.kp_valid).astype(jnp.int32))
    if _DEBUG:
        def cnt(m):
            return jnp.sum((m & cand).astype(jnp.int32))
        jax.debug.print(
            "TLMDBG fid={f} in={i} out1={o1} pred={p} radmatch={m} out2={o2} "
            "tracked={t} | cand={c} front={fr} border={b} angle={an} "
            "range={rg} oct={oc}",
            f=frame.frame_id, i=jnp.sum(a_ok0.astype(jnp.int32)),
            o1=jnp.sum(outlier1.astype(jnp.int32)),
            p=jnp.sum(is_predicted.astype(jnp.int32)),
            m=jnp.sum(matched.astype(jnp.int32)),
            o2=jnp.sum(outlier2.astype(jnp.int32)), t=tracked,
            c=jnp.sum(cand.astype(jnp.int32)), fr=cnt(z >= 0),
            b=cnt(in_border), an=cnt(angle_ok), rg=cnt(range_ok),
            oc=cnt(oct_ok))
        # where do candidates project? u-histogram: [<-W, -W..0, 8 in-image
        # octiles, W..2W, >2W] — exit-side pile-up vs geometric blow-up
        ub = jnp.clip(jnp.floor(u / (width / 8.0)).astype(jnp.int32) + 2,
                      0, 12)
        uh = jnp.zeros((13,), jnp.int32).at[
            jnp.where(cand & (z >= 0), ub, 13)].add(1, mode="drop")
        jax.debug.print("TLMDBG uhist={h}", h=uh)
    ok = tracked >= min_tracked_features
    frame = frame._replace(assoc=jnp.where(ok, assoc3, -1))

    if not score_recent_points:
        found = jnp.zeros_like(found)
        predicted = jnp.zeros_like(predicted)
    else:
        scored = is_recent
        found = jnp.where(scored, found, 0)
        predicted = jnp.where(scored, predicted, 0)

    return TrackLocalMapResult(
        frame=frame,
        succeeded=ok,
        found_delta=found,
        predicted_delta=predicted,
        tracked_count=tracked,
    )
