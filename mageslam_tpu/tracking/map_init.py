"""Monocular map initialization.

Replaces Tracking/MapInitialization.{h,cpp} (1443 LoC): bootstrap a map from
two frames via batched 5-point RANSAC.

Pipeline (TryIntializeMapWithProvidedFrames, MapInitialization.cpp:550-700):
  1. two-way descriptor match between the frame pair (the reference counts
     descriptor persistence over ≥35% of up to 4 buffered frames
     — MapInitialization.cpp:560-600; with two frames that reduces to a
     direct match, the form used here; the host driver enforces the
     150–540 ms interval gates)
  2. FindPossiblePoses (:181): RANSAC over 5-point samples with the
     min-pixel-spread constraint, each sample solved by the batched
     hidden-variable 5-point (geometry.essential), each candidate E scored by
     the symmetric fundamental transfer error over all matches (:279) with
     min-inlier gates, cheirality-consistent decomposition
  3. FindCorrectPose (:324): per candidate pose, triangulate all matches,
     gate by cheirality + parallax distance + symmetric epipolar error,
     median-depth test, best-vs-next-best pose dissimilarity, Z-contribution
  4. init BA: full-batch BA with frame 1 fixed (BundleAdjustInitializationData
     :1096 — only the first keyframe fixed, no tethers), outlier culling
  5. validation: minimum surviving map points (ValidateInitializationData)

All RANSAC hypotheses evaluate in parallel: (B, 5) samples → (B·10,) essential
candidates → one (B·10, M) scoring matrix — the TPU-native form of the
reference's sequential 90-iteration loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.problem import BAState, empty_problem
from ..ba.step import step_bundle_adjust
from ..geometry.essential import (
    MAX_ROOTS,
    decompose_essential,
    five_point_essential,
    triangulate_midpoint_pair,
)
from ..geometry.se3 import Pose
from ..geometry.triangulation import triangulate_dlt
from ..ops.matching import match_two_way


class InitSettings(NamedTuple):
    """MonoMapInitializationSettings (MageSettings.h:95-133), defaults preserved."""

    fundamental_transfer_error_threshold: float = 1.1
    min_feature_matches: int = 65
    min_scoring_inliers: int = 50
    min_inlier_percentage: float = 0.5
    min_initial_map_points: int = 40
    min_map_points: int = 60
    max_parallax_3d_distance: float = 500.0
    max_parallax_3d_median_distance: float = 20.0
    min_candidate_pose_disimilarity: float = 0.3
    max_pose_contribution_z: float = 0.66
    ransac_iterations: int = 90
    max_epipolar_error: float = 3.5
    min_pixel_spread: float = 40.0
    final_ba_huber_width: float = 0.9
    final_ba_max_outlier_error: float = 4.0
    final_ba_max_outlier_error_scale: float = 0.75
    final_ba_steps: int = 15
    # OrbMatcherSettings defaults (MageSettings.h:36-39) — the console golden
    # path keeps these for FivePointMatchingSettings. 45/8 here (a previous
    # overtightened guess) made RANSAC converge on ghost essentials on
    # repetitive texture: fewer, ratio-test-starved matches scored a
    # z-dominant wrong pose above the true lateral one.
    max_hamming_dist: int = 30
    min_hamming_diff: int = 1


class InitResult(NamedTuple):
    succeeded: jax.Array        # () bool
    pose2: Pose                 # frame-2 world→camera (frame 1 = identity)
    points: jax.Array           # (M, 3) triangulated map points (world)
    point_valid: jax.Array      # (M,) bool — survived all gates + BA
    feat1: jax.Array            # (M,) int32 feature index in frame 1
    feat2: jax.Array            # (M,) int32 feature index in frame 2
    match_count: jax.Array      # () int32


def _sample_spread_ok(xy1, xy2, samples, min_spread):
    """Per RANSAC sample (B, 5): all pairs at least min_spread apart in both
    frames (the reference's rejection-sampled min-pixel-spread sets,
    MapInitialization.cpp:215-236 — here checked post-hoc on random samples)."""
    p1 = xy1[samples]            # (B, 5, 2)
    p2 = xy2[samples]
    d1 = jnp.sum((p1[:, :, None] - p1[:, None, :]) ** 2, axis=-1)
    d2 = jnp.sum((p2[:, :, None] - p2[:, None, :]) ** 2, axis=-1)
    eye = jnp.eye(5, dtype=bool)
    far = (d1 >= min_spread**2) & (d2 >= min_spread**2) | eye[None]
    return jnp.all(far, axis=(1, 2))


def _symmetric_transfer_score(F, xy1, xy2, match_ok, thr):
    """ScoreFundamentalMatrix (MapInitialization.cpp:279-323): symmetric
    perpendicular epipolar distance², summed (thr - d²) over double-inliers.
    F: (C, 3, 3) frame1→frame2. Returns (score (C,), inliers (C,))."""
    one = jnp.ones_like(xy1[:, :1])
    h1 = jnp.concatenate([xy1, one], axis=-1)        # (M, 3)
    h2 = jnp.concatenate([xy2, one], axis=-1)
    l2 = jnp.einsum("cij,mj->cmi", F, h1)            # line in image 2
    l1 = jnp.einsum("cji,mj->cmi", F, h2)            # line in image 1 (Fᵀ)
    d12 = jnp.einsum("cmi,mi->cm", l2, h2) ** 2 / (
        l2[..., 0] ** 2 + l2[..., 1] ** 2 + 1e-20
    )
    d21 = jnp.einsum("cmi,mi->cm", l1, h1) ** 2 / (
        l1[..., 0] ** 2 + l1[..., 1] ** 2 + 1e-20
    )
    inlier = (d12 < thr) & (d21 < thr) & match_ok[None, :]
    score = jnp.sum(jnp.where(inlier, (thr - d12) + (thr - d21), 0.0), axis=1)
    return score, jnp.sum(inlier.astype(jnp.int32), axis=1)


@partial(jax.jit, static_argnames=("settings", "ransac_batch"))
def try_initialize_pair(
    xy1: jax.Array, desc1: jax.Array, valid1: jax.Array,
    xy2: jax.Array, desc2: jax.Array, valid2: jax.Array,
    cam: jax.Array,                  # (4,) fx fy cx cy — undistorted, shared
    rng_key: jax.Array,
    settings: InitSettings = InitSettings(),
    ransac_batch: int = 128,
) -> InitResult:
    """One initialization attempt on an (undistorted) frame pair.
    Feature arrays are (N, ...); the result's M = N (per-match slots aligned
    to frame-1 features)."""
    N = xy1.shape[0]
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]

    # ---- 1. match ----
    m_idx, _ = match_two_way(
        desc1, valid1, desc2, valid2,
        settings.max_hamming_dist, settings.min_hamming_diff,
    )
    match_ok = m_idx >= 0
    n_matches = jnp.sum(match_ok.astype(jnp.int32))
    m_safe = jnp.where(match_ok, m_idx, 0)
    mxy1 = xy1                                     # (N, 2) frame-1 position per match slot
    mxy2 = xy2[m_safe]                             # (N, 2) matched frame-2 position

    # normalized coordinates
    n1 = jnp.stack([(mxy1[:, 0] - cx) / fx, (mxy1[:, 1] - cy) / fy], axis=-1)
    n2 = jnp.stack([(mxy2[:, 0] - cx) / fx, (mxy2[:, 1] - cy) / fy], axis=-1)

    # ---- 2. RANSAC 5-point ----
    # spread-constrained sampling, matching the reference's rejection loop
    # (MapInitialization.cpp:209-244: re-draw until every pair in the 5-set
    # is ≥ MinPixelSpread apart in BOTH frames). Greedy masked-gumbel builds
    # each set in 5 steps: every draw excludes candidates within min_spread
    # of the already-chosen points, so a valid set is found whenever one
    # exists — a plain uniform draw + post-hoc reject discards >90% of the
    # hypothesis budget when matches cluster in part of the image (e.g. a
    # half-textured view), which starves RANSAC exactly where init is hard.
    keys = jax.random.split(rng_key, ransac_batch)
    spread_sq = jnp.float32(settings.min_pixel_spread) ** 2

    def draw(key):
        g = jax.random.gumbel(key, (5, N))
        # two-tier penalty: prefer spread-out candidates; if none remain,
        # fall back to any VALID match (the set then fails _sample_spread_ok
        # and is discarded) — never to an invalid slot
        base = jnp.where(match_ok, 0.0, -1e12)
        idxs = []
        ok = match_ok
        for t in range(5):
            pick = jnp.argmax(g[t] + base + jnp.where(ok, 0.0, -1e9))
            idxs.append(pick)
            d1 = jnp.sum((mxy1 - mxy1[pick]) ** 2, axis=-1)
            d2 = jnp.sum((mxy2 - mxy2[pick]) ** 2, axis=-1)
            ok = ok & (d1 >= spread_sq) & (d2 >= spread_sq)
        return jnp.stack(idxs)

    samples = jax.vmap(draw)(keys)                 # (B, 5)
    # post-hoc validity: flags the (rare) sets where no spread-out choice
    # remained and the greedy step fell back to a too-close candidate
    spread_ok = _sample_spread_ok(mxy1, mxy2, samples, settings.min_pixel_spread)

    E, e_valid = five_point_essential(n1[samples], n2[samples])   # (B, R, 3, 3)
    C = ransac_batch * MAX_ROOTS
    E_flat = E.reshape(C, 3, 3)
    cand_ok = (e_valid & spread_ok[:, None]).reshape(C)

    # fundamental from essential: F = K⁻ᵀ E K⁻¹ (shared intrinsics)
    Kinv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    Kinv = Kinv.at[0, 0].set(1.0 / fx).at[1, 1].set(1.0 / fy)
    Kinv = Kinv.at[0, 2].set(-cx / fx).at[1, 2].set(-cy / fy)
    F = jnp.einsum("ji,cjk,kl->cil", Kinv, E_flat, Kinv)

    score, inliers = _symmetric_transfer_score(
        F, mxy1, mxy2, match_ok, settings.fundamental_transfer_error_threshold
    )
    qualified = (
        cand_ok
        & (inliers >= settings.min_scoring_inliers)
        & (inliers.astype(jnp.float32) / jnp.maximum(n_matches.astype(jnp.float32), 1.0)
           > settings.min_inlier_percentage)
    )
    score = jnp.where(qualified, score, 0.0)
    best_c = jnp.argmax(score)
    best_E = E_flat[best_c]
    have_candidate = score[best_c] > 0.0

    # ---- 3. pose disambiguation over the 4 decompositions ----
    poses4 = decompose_essential(best_E)           # (4,) poses
    max_epi = 2.0 * settings.max_epipolar_error

    def eval_pose(R, t):
        pose = Pose(R, t)
        # twisted-pair early-out: right axis must agree with identity frame 1
        right_ok = R[0, 0] > 0.0
        X = triangulate_midpoint_pair(pose, n1, n2)              # (N, 3) world (frame1)
        z1 = X[:, 2]
        scale = 1.0 / jnp.maximum(jnp.sum(pose.center() ** 2), 1e-12)
        # cheirality in BOTH cameras: the twisted-pair ghost triangulates its
        # points BEHIND camera 2 (measured: 0/212 front-of-2 for the ghost vs
        # 212/212 for the true pose on a wall-dominant view) while the
        # negative-depth projection x/z can still land on the feature, so a
        # z1-only gate + reprojection radius lets the ghost tie the true pose
        # (0.5% score margin) and the dissimilarity gate then rejects BOTH.
        Xc2_front = pose.transform(X)
        front = (z1 > 0) & (Xc2_front[:, 2] > 0)
        parallax_ok = z1 * scale <= settings.max_parallax_3d_distance
        # symmetric epipolar error in pixels against best_E's fundamental
        Fp = jnp.einsum("ji,jk,kl->il", Kinv, best_E, Kinv)
        one = jnp.ones_like(mxy1[:, :1])
        h1 = jnp.concatenate([mxy1, one], axis=-1)
        h2 = jnp.concatenate([mxy2, one], axis=-1)
        l2 = jnp.einsum("ij,mj->mi", Fp, h1)
        l1 = jnp.einsum("ji,mj->mi", Fp, h2)
        e12 = jnp.abs(jnp.einsum("mi,mi->m", l2, h2)) / jnp.sqrt(
            l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-20
        )
        e21 = jnp.abs(jnp.einsum("mi,mi->m", l1, h1)) / jnp.sqrt(
            l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-20
        )
        epi = e12 + e21
        # reprojection of the triangulated point into BOTH frames. The
        # epipolar score is identical for every decomposition of one E, so
        # on plane-dominant scenes the twisted-pair ghost (which keeps all
        # points in front — the classic two-fold planar ambiguity) ties the
        # reference's epi-only scoring and the dissimilarity gate rejects
        # forever (MapInitialization.cpp:380-470 shares this blindness).
        # The ghost's triangulations satisfy the epipolar constraint but
        # NOT the projections: requiring the midpoint triangulation to
        # actually reproject separates the poses decisively.
        z1s = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
        r1 = jnp.hypot(fx * X[:, 0] / z1s + cx - mxy1[:, 0],
                       fy * X[:, 1] / z1s + cy - mxy1[:, 1])
        Xc2 = pose.transform(X)
        z2s = jnp.where(jnp.abs(Xc2[:, 2]) < 1e-9, 1e-9, Xc2[:, 2])
        r2 = jnp.hypot(fx * Xc2[:, 0] / z2s + cx - mxy2[:, 0],
                       fy * Xc2[:, 1] / z2s + cy - mxy2[:, 1])
        reproj_ok = (r1 < max_epi) & (r2 < max_epi)
        good = match_ok & front & parallax_ok & (epi < max_epi) & reproj_ok
        p_score = jnp.sum(jnp.where(good, max_epi - epi, 0.0)) * right_ok
        n_good = jnp.sum(good.astype(jnp.int32))
        # median depth over good points
        depth_sorted = jnp.sort(jnp.where(good, z1, jnp.inf))
        med = depth_sorted[jnp.maximum(n_good // 2, 0)]
        pct_ok = (
            (n_good >= settings.min_scoring_inliers)
            & (n_good.astype(jnp.float32) / jnp.maximum(n_matches.astype(jnp.float32), 1.0)
               > settings.min_inlier_percentage)
            & (med <= settings.max_parallax_3d_median_distance)
        )
        return jnp.where(pct_ok, p_score, 0.0), good, X

    scores4, good4, X4 = jax.vmap(eval_pose)(poses4.R, poses4.t)
    order = jnp.argsort(-scores4)
    best_p, next_p = order[0], order[1]
    s_best, s_next = scores4[best_p], scores4[next_p]
    dissimilar = (s_best - s_next) / jnp.maximum(s_best, 1e-12) \
        >= settings.min_candidate_pose_disimilarity
    pose2 = Pose(poses4.R[best_p], poses4.t[best_p])
    z_ok = jnp.abs(pose2.center()[2]) <= settings.max_pose_contribution_z
    pose_ok = have_candidate & (s_best > 0) & dissimilar & z_ok

    inlier_mask = good4[best_p] & pose_ok

    # ---- refined triangulation (DLT) for the accepted correspondence set ----
    X = triangulate_dlt(cam, Pose.identity(), mxy1, cam, pose2, mxy2)
    X = jnp.where(jnp.isfinite(X).all(axis=-1, keepdims=True), X, X4[best_p])

    # ---- 4. init BA: frame 1 fixed, frame 2 + points free ----
    n_obs = 2 * N
    problem = empty_problem(2, N, n_obs)
    obs_cam = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)])
    obs_pt = jnp.tile(jnp.arange(N, dtype=jnp.int32), 2)
    obs_uv = jnp.concatenate([mxy1, mxy2], axis=0)
    obs_info = jnp.concatenate([inlier_mask, inlier_mask]).astype(jnp.float32)
    problem = problem._replace(
        poses=Pose(
            jnp.stack([jnp.eye(3), pose2.R]),
            jnp.stack([jnp.zeros(3), pose2.t]),
        ),
        intrinsics=jnp.tile(cam[None], (2, 1)),
        cam_fixed=jnp.array([True, False]),
        cam_valid=jnp.array([True, True]),
        points=X,
        pt_valid=inlier_mask,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=obs_uv,
        obs_info=obs_info,
    )
    state = BAState.from_problem(problem)
    widths = settings.final_ba_huber_width * (
        0.95 ** jnp.arange(settings.final_ba_steps, dtype=jnp.float32)
    )
    state, mse, outliers = step_bundle_adjust(
        problem, state, widths,
        jnp.float32(settings.final_ba_max_outlier_error**2),
    )

    # surviving points: both observations kept
    alive = (state.obs_info[:N] > 0) & (state.obs_info[N:] > 0) & inlier_mask
    n_points = jnp.sum(alive.astype(jnp.int32))

    # ---- 5. validation ----
    ok = (
        pose_ok
        & (n_matches >= settings.min_feature_matches)
        & (n_points >= settings.min_map_points)
    )
    return InitResult(
        succeeded=ok,
        pose2=Pose(state.poses.R[1], state.poses.t[1]),
        points=state.points,
        point_valid=alive & ok,
        feat1=jnp.arange(N, dtype=jnp.int32),
        feat2=m_safe,
        match_count=n_matches,
    )


@partial(jax.jit, static_argnames=("min_pct", "ba_iters", "max_hamming",
                                   "min_diff"))
def validate_third_frame(
    result: InitResult,
    anchor_desc: jax.Array, anchor_valid: jax.Array,
    third_xy: jax.Array, third_desc: jax.Array, third_valid: jax.Array,
    cam: jax.Array,
    key: jax.Array,
    min_pct: float = 0.5,          # MinThirdFrameMatchPercentage
    max_err: float = 8.0,          # ExtraFrame_MaxOutlierError
    ba_iters: int = 5,             # ExtraFrame_BundleAdjustmentSteps
    max_hamming: int = 30,         # ExtraFrameMatchingSettings
    min_diff: int = 1,
) -> jax.Array:
    """Locate a third (middle) frame against the freshly triangulated pair map
    and require enough BA inliers (the reference's 2(+1)-frame bootstrap:
    MapInitialization.cpp:699 locate third frame + MinThirdFrameMatchPercentage
    gate). Returns () bool."""
    from ..geometry.pnp import pnp_ransac

    # third-frame keypoints ↔ map points via the anchor frame's descriptors
    # (result.feat1 slots ARE anchor feature slots)
    m_idx, _ = match_two_way(anchor_desc, anchor_valid & result.point_valid,
                             third_desc, third_valid, max_hamming, min_diff)
    has = m_idx >= 0
    n_matches = jnp.sum(has.astype(jnp.int32))
    t_safe = jnp.where(has, m_idx, 0)
    uv = third_xy[t_safe]

    pnp = pnp_ransac(result.points, uv, has, cam, key,
                     max_reprojection_error=max_err, min_inliers=10)
    from ..ba.pose_only import optimize_pose

    pose, chi2, depth = optimize_pose(
        pnp.pose, cam, result.points, uv, pnp.inliers.astype(jnp.float32),
        huber_width=4.0, num_iters=ba_iters,
    )
    inlier = has & (chi2 <= max_err**2) & (depth > 0)
    pct = jnp.sum(inlier.astype(jnp.float32)) / jnp.maximum(
        n_matches.astype(jnp.float32), 1.0)
    return pnp.ok & (pct >= min_pct)
