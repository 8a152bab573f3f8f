"""Relocalization: BoW candidates → PnP-RANSAC → pose BA → guided rematch.

Replaces the lost-tracking path of PoseEstimator::TryEstimatePoseFromCandidates
(Tracking/PoseEstimator.cpp:219-437): the reference round-robins candidate
keyframes through {IndexedMatch → solvePnPRansac → pose-only BA → guided
radius rematch → final pose-only BA} with inlier-percentage gates at each
stage (RelocalizationSettings, MageSettings.h:236-250).

TPU shape: every candidate runs every stage in parallel (vmap over the
candidate axis); the round-robin early-out becomes a final argmax over
per-candidate scores. IndexedMatch (BoW-bucketed brute force) is a dense
masked match — the direct index only existed to prune CPU work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.pose_only import optimize_pose
from ..geometry.pnp import pnp_ransac
from ..geometry.se3 import Pose
from ..ops.matching import dedup_by_target, match_two_way, radius_match
from ..worldmap.map_state import MapState
from .frame_state import TrackedFrame


class RelocResult(NamedTuple):
    pose: Pose
    assoc: jax.Array       # (N,) int32 — map point slot per current keypoint
    succeeded: jax.Array   # () bool
    candidate: jax.Array   # () int32 — winning keyframe slot or -1


def relocalize(
    frame: TrackedFrame,
    state: MapState,
    candidate_slots: jax.Array,   # (C,) int32 keyframe slots (BoW candidates)
    candidate_ok: jax.Array,      # (C,) bool
    key: jax.Array,
    min_brute_force: int = 20,    # MinBruteForceCorrespondences
    min_radius_matches: int = 15, # MinRadiusMatchCorrespondences
    ransac_inlier_pct: float = 0.4,
    ba_inlier_pct: float = 0.4,
    max_pnp_error: float = 8.0,
    max_ba_error: float = 8.0,
    ba_iterations: int = 10,
    search_radius: float = 20.0,
    max_hamming: int = 45,
    min_hamming_diff: int = 8,
    pnp_hypotheses: int = 64,
) -> RelocResult:
    N = frame.kp_xy.shape[0]
    C = candidate_slots.shape[0]
    keys = jax.random.split(key, C)

    def per_candidate(kc, ok, k):
        kc_s = jnp.where(ok, kc, 0)
        kc_desc = state.kf_desc[kc_s]
        kc_assoc = state.kf_assoc[kc_s]
        kc_valid = state.kf_kp_valid[kc_s] & (kc_assoc >= 0)
        a_safe = jnp.where(kc_assoc >= 0, kc_assoc, 0)
        kc_valid = kc_valid & state.mp_valid[a_safe]
        pts3d = state.mp_pos[a_safe]                           # (N, 3)

        # 1. brute-force match candidate's associated features → current frame
        m_idx, _ = match_two_way(
            kc_desc, kc_valid & ok, frame.desc, frame.kp_valid,
            max_hamming, min_hamming_diff,
        )
        has = m_idx >= 0
        n_bf = jnp.sum(has.astype(jnp.int32))
        t_safe = jnp.where(has, m_idx, 0)
        uv = frame.kp_xy[t_safe]

        # 2. PnP-RANSAC on the matched 2D-3D set
        pnp = pnp_ransac(
            pts3d, uv, has, frame.cam, k,
            max_reprojection_error=max_pnp_error,
            min_inliers=min_brute_force, hypotheses=pnp_hypotheses,
        )
        inl_pct_ok = (
            pnp.num_inliers.astype(jnp.float32)
            / jnp.maximum(n_bf.astype(jnp.float32), 1.0)
        ) >= ransac_inlier_pct

        # 3. pose-only BA on the PnP inliers (BundleAdjustPose,
        #    PoseEstimator.cpp:168-207)
        info = (pnp.inliers).astype(jnp.float32)
        pose1, chi2, depth = optimize_pose(
            pnp.pose, frame.cam, pts3d, uv, info,
            huber_width=0.0, num_iters=ba_iterations,
        )

        # 4. guided radius rematch: project ALL candidate points with pose1,
        #    match at SearchRadius against all current keypoints. OCTAVE-
        #    AWARE like the tracking cascade: the observing keyframe
        #    keypoint's pyramid level must match the current keypoint's
        #    (the reference's spatial index stores octave as a 3rd query
        #    coordinate for reloc's rematch too, KeypointSpatialIndex.h:
        #    36-37); octave-agnostic matching loses candidates to the
        #    second-best ambiguity gate on self-similar structure.
        Xc = pose1.transform(pts3d)
        z = Xc[:, 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = frame.cam[0] * Xc[:, 0] * inv_z + frame.cam[2]
        v = frame.cam[1] * Xc[:, 1] * inv_z + frame.cam[3]
        proj = jnp.stack([u, v], axis=-1)
        cand = kc_valid & ok & (z > 0)
        r_idx, r_dist = radius_match(
            kc_desc, proj, state.kf_kp_octave[kc_s], cand,
            frame.desc, frame.kp_xy, frame.kp_octave, frame.kp_valid,
            jnp.float32(search_radius), jnp.int32(max_hamming),
            jnp.int32(min_hamming_diff), octave_tol=1,
        )
        r_idx = dedup_by_target(r_idx, r_dist)
        r_has = r_idx >= 0
        n_radius = jnp.sum(r_has.astype(jnp.int32))

        # 5. final pose-only BA on the rematched set with outlier gate
        rt_safe = jnp.where(r_has, r_idx, 0)
        uv2 = frame.kp_xy[rt_safe]
        info2 = r_has.astype(jnp.float32)
        pose2, chi2_2, depth_2 = optimize_pose(
            pose1, frame.cam, pts3d, uv2, info2,
            huber_width=0.0, num_iters=ba_iterations,
        )
        final_inlier = r_has & (chi2_2 <= max_ba_error ** 2) & (depth_2 > 0)
        n_final = jnp.sum(final_inlier.astype(jnp.int32))
        final_pct_ok = (
            n_final.astype(jnp.float32)
            / jnp.maximum(n_radius.astype(jnp.float32), 1.0)
        ) >= ba_inlier_pct

        success = (
            ok & pnp.ok & inl_pct_ok
            & (n_bf >= min_brute_force)
            & (n_radius >= min_radius_matches)
            & final_pct_ok
        )
        # per-keypoint association from the final inliers
        tgt = jnp.where(final_inlier, r_idx, N)
        assoc = jnp.full((N,), -1, jnp.int32).at[tgt].max(
            jnp.where(final_inlier, a_safe, -1), mode="drop"
        )
        return success, n_final, pose2, assoc

    success, n_final, poses, assocs = jax.vmap(per_candidate)(
        candidate_slots, candidate_ok, keys
    )
    score = jnp.where(success, n_final, -1)
    best = jnp.argmax(score)
    ok = success[best]
    return RelocResult(
        pose=Pose(poses.R[best], poses.t[best]),
        assoc=jnp.where(ok, assocs[best], -1),
        succeeded=ok,
        candidate=jnp.where(ok, candidate_slots[best], -1),
    )
