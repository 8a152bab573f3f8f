"""Session-parallel SLAM: a batch of independent sessions over a device mesh.

Serving shape: B cameras stream frames; each session's map/tracking state
lives sharded over the 'sessions' mesh axis and every frame step runs as one
pjit-compiled batched computation. No cross-session communication exists, so
the partitioned program has zero collectives on the hot path — perfect
scaling across ICI-connected chips (and the building block the driver's
multi-chip dry-run validates).
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MageSlamSettings, golden_path_settings
from ..tracking.frame_state import TrackedFrame, TrackingHistory
from ..tracking.pose_estimation import (
    estimate_next_pose_from_history,
    estimate_pose_with_prior,
)
from ..tracking.track_local_map import track_local_map
from ..worldmap.map_state import MapState


def make_session_mesh(devices=None, name: str = "sessions") -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (name,))


def _single_track_step(settings: MageSlamSettings, width: float, height: float,
                       map_state: MapState, history: TrackingHistory,
                       frame: TrackedFrame):
    """One session's tracking fast path (same composition as
    runtime.pipeline.SlamSession._build_track_core)."""
    ts = settings.TrackLocalMapSettings
    ps = settings.PoseEstimationSettings
    fes = settings.MonoSettings.MonoCamera.FeatureExtractorSettings

    prior = estimate_next_pose_from_history(history, frame.timestamp)
    frame = frame._replace(pose=prior)
    gm = estimate_pose_with_prior(
        frame, history, map_state.mp_pos, map_state.mp_valid,
        map_state.mp_refine_count,
        minimum_feature_matches=ps.FeatureMatchThreshold,
        search_radius=ps.SearchRadius,
        wider_search_radius=ps.WiderSearchRadius,
        extra_wider_search_radius=ps.ExtraWiderSearchRadius,
        small_match_ratio=ps.FeatureSmallMatchRatioThreshold,
        max_hamming=ps.OrbMatcherSettings.MaxHammingDistance,
        min_hamming_diff=ps.OrbMatcherSettings.MinHammingDifference,
    )
    frame = frame._replace(assoc=gm.assoc)
    res = track_local_map(
        frame, map_state, map_state.mp_valid,
        num_levels=fes.NumLevels, pyramid_scale=fes.ScaleFactor,
        image_width=width, image_height=height,
        image_border=fes.PatchSize / 2.0,
        min_degrees_view_angle=ts.MinDegreesBetweenCurrentViewAndMapPointView,
        match_search_radius=ts.MatchSearchRadius,
        max_hamming=ts.OrbMatcherSettings.MaxHammingDistance,
        min_hamming_diff=ts.OrbMatcherSettings.MinHammingDifference,
        max_outlier_error=ts.MaxOutlierError,
        max_outlier_error_pose_estimation=ts.MaxOutlierErrorPoseEstimation,
        min_tracked_features=ts.MinTrackedFeatureCount,
    )
    return res._replace(succeeded=gm.succeeded & res.succeeded)


def batched_track_step(mesh: Mesh, settings: MageSlamSettings | None = None,
                       width: float = 320.0, height: float = 180.0,
                       axis: str = "sessions"):
    """Build the pjit-compiled batched step: (map_states, histories, frames)
    with leading batch dim sharded over `axis` → TrackLocalMapResult batch.

    Returns (step_fn, shard_leading) where shard_leading places a pytree's
    leading axis over the mesh axis."""
    settings = settings or golden_path_settings()
    single = partial(_single_track_step, settings, width, height)
    batched = jax.vmap(single)

    batch_sharding = NamedSharding(mesh, P(axis))

    def shard_leading(tree):
        def put(x):
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.tree.map(put, tree)

    step = jax.jit(
        batched,
        in_shardings=(batch_sharding, batch_sharding, batch_sharding),
        out_shardings=batch_sharding,
    )
    return step, shard_leading
