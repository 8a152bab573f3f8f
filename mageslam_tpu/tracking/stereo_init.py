"""Stereo map initialization: known-extrinsics pair → instant metric-ish map.

Replaces Stereo/StereoMapInit.{h,cpp} (231 LoC): match the stereo pair,
normalize the known extrinsics to unit baseline (StereoMapInit.cpp:135-148),
triangulate matches with epipolar + distance-ratio gates, require
MinFeatureMatches / MinInitMapPoints, tether the pair with an EXTRINSIC
constraint at InitializationTetherStrength, and run the init BA
(StereoMapInitializationSettings, MageSettings.h:135-147).

The reference pre-filters frame-0 features to the overlap crop region
(CalculateOverlapCropSourceInTarget); the dense TPU matcher makes that
pruning unnecessary — out-of-overlap features simply fail the epipolar gate.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.problem import BAState, TETHER_TRANSFORM, empty_problem
from ..ba.step import step_bundle_adjust
from ..geometry.se3 import Pose
from ..geometry.triangulation import triangulate_dlt, triangulate_midpoint
from ..ops.matching import match_two_way
from .map_init import InitResult


class StereoInitSettings(NamedTuple):
    """StereoMapInitializationSettings (MageSettings.h:135-147)."""

    min_init_map_points: int = 15
    min_feature_matches: int = 40
    max_outlier_error: float = 2.5
    max_epipolar_error: float = 5.5
    min_accepted_distance_ratio: float = 2.0
    initialization_tether_strength: float = 50.0
    max_depth_meters: float = 2.3
    # OrbMatcherSettings defaults (MageSettings.h:36-39, BAG_PROPERTY at :145)
    max_hamming: int = 30
    min_hamming_diff: int = 1
    ba_steps: int = 15
    ba_huber_width: float = 1.8


@partial(jax.jit, static_argnames=("settings",))
def stereo_initialize(
    xy0: jax.Array, desc0: jax.Array, valid0: jax.Array,
    xy1: jax.Array, desc1: jax.Array, valid1: jax.Array,
    cam: jax.Array,              # (4,) camera-0 undistorted intrinsics
    frame0_to_frame1: Pose,      # known extrinsic transform (camera0 → camera1)
    settings: StereoInitSettings = StereoInitSettings(),
    cam2: jax.Array | None = None,  # (4,) camera-1 intrinsics (mixed rigs:
                                    # the rescaled secondary calibration —
                                    # ImageAnalyzer.cpp:131-240); None = cam
) -> InitResult:
    N = xy0.shape[0]
    cam2 = cam if cam2 is None else cam2

    # normalize the extrinsics to unit baseline — map units = baselines
    # (StereoMapInit.cpp:135-148)
    baseline = jnp.linalg.norm(frame0_to_frame1.t)
    ok_baseline = baseline > 1e-5
    inv_b = 1.0 / jnp.maximum(baseline, 1e-5)
    pose2 = Pose(frame0_to_frame1.R, frame0_to_frame1.t * inv_b)
    pose1 = Pose.identity()

    m_idx, _ = match_two_way(
        desc0, valid0, desc1, valid1,
        settings.max_hamming, settings.min_hamming_diff,
    )
    match_ok = m_idx >= 0
    n_matches = jnp.sum(match_ok.astype(jnp.int32))
    m_safe = jnp.where(match_ok, m_idx, 0)
    uv1 = xy0
    uv2 = xy1[m_safe]

    # triangulate with the KNOWN relative pose
    X = triangulate_dlt(cam, pose1, uv1, cam2, pose2, uv2)
    X_mid = triangulate_midpoint(cam, pose1, uv1, cam2, pose2, uv2)
    X = jnp.where(jnp.isfinite(X).all(axis=-1, keepdims=True), X, X_mid)

    # gates: cheirality both views, symmetric epipolar error, distance ratio
    z1 = pose1.transform(X)[:, 2]
    z2 = pose2.transform(X)[:, 2]
    # epipolar via the known essential: E = [t]x R mapping cam1 rays → cam2 lines
    tx = jnp.array([
        [0.0, -pose2.t[2], pose2.t[1]],
        [pose2.t[2], 0.0, -pose2.t[0]],
        [-pose2.t[1], pose2.t[0], 0.0],
    ])
    E = tx @ pose2.R
    Kinv = jnp.array([
        [1.0 / cam[0], 0.0, -cam[2] / cam[0]],
        [0.0, 1.0 / cam[1], -cam[3] / cam[1]],
        [0.0, 0.0, 1.0],
    ])
    Kinv2 = jnp.array([
        [1.0 / cam2[0], 0.0, -cam2[2] / cam2[0]],
        [0.0, 1.0 / cam2[1], -cam2[3] / cam2[1]],
        [0.0, 0.0, 1.0],
    ])
    F = Kinv2.T @ E @ Kinv
    one = jnp.ones_like(uv1[:, :1])
    h1 = jnp.concatenate([uv1, one], axis=-1)
    h2 = jnp.concatenate([uv2, one], axis=-1)
    l2 = jnp.einsum("ij,mj->mi", F, h1)
    l1 = jnp.einsum("ji,mj->mi", F, h2)
    e12 = jnp.abs(jnp.sum(l2 * h2, axis=-1)) / jnp.sqrt(
        l2[:, 0] ** 2 + l2[:, 1] ** 2 + 1e-20)
    e21 = jnp.abs(jnp.sum(l1 * h1, axis=-1)) / jnp.sqrt(
        l1[:, 0] ** 2 + l1[:, 1] ** 2 + 1e-20)
    epi_ok = (e12 + e21) <= 2.0 * settings.max_epipolar_error

    dist = jnp.linalg.norm(X - pose1.center()[None], axis=-1)
    ratio_ok = dist >= settings.min_accepted_distance_ratio  # baseline = 1
    # MaxDepthMeters is metric; map units are baselines → divide by baseline
    depth_ok = z1 <= settings.max_depth_meters * inv_b

    inlier = match_ok & (z1 > 0) & (z2 > 0) & epi_ok & ratio_ok & depth_ok

    # ---- init BA with EXTRINSIC tether (frame 1 fixed) ----
    problem = empty_problem(2, N, 2 * N)
    obs_cam = jnp.concatenate([jnp.zeros(N, jnp.int32), jnp.ones(N, jnp.int32)])
    obs_pt = jnp.tile(jnp.arange(N, dtype=jnp.int32), 2)
    obs_uv = jnp.concatenate([uv1, uv2], axis=0)
    obs_info = jnp.concatenate([inlier, inlier]).astype(jnp.float32)
    problem = problem._replace(
        poses=Pose(jnp.stack([pose1.R, pose2.R]), jnp.stack([pose1.t, pose2.t])),
        intrinsics=jnp.stack([cam, cam2]),
        cam_fixed=jnp.array([True, False]),
        cam_valid=jnp.array([True, True]),
        points=X,
        pt_valid=inlier,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=obs_uv,
        obs_info=obs_info,
        tether_kind=problem.tether_kind.at[0].set(TETHER_TRANSFORM),
        tether_cam1=problem.tether_cam1.at[0].set(0),
        tether_cam2=problem.tether_cam2.at[0].set(1),
        tether_pose=Pose(
            problem.tether_pose.R.at[0].set(pose2.R),
            problem.tether_pose.t.at[0].set(pose2.t),
        ),
        tether_weight=problem.tether_weight.at[0].set(
            settings.initialization_tether_strength),
    )
    state = BAState.from_problem(problem)
    widths = settings.ba_huber_width * (
        0.95 ** jnp.arange(settings.ba_steps, dtype=jnp.float32))
    state, mse, outliers = step_bundle_adjust(
        problem, state, widths, jnp.float32(settings.max_outlier_error ** 2))

    alive = (state.obs_info[:N] > 0) & (state.obs_info[N:] > 0) & inlier
    n_points = jnp.sum(alive.astype(jnp.int32))
    ok = (
        ok_baseline
        & (n_matches >= settings.min_feature_matches)
        & (n_points >= settings.min_init_map_points)
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
