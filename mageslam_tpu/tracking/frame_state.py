"""Per-frame tracking state containers.

The reference carries an in-flight frame as a KeyframeBuilder/KeyframeProxy
(pose + MapPointAssociations, Tracking/KeyframeBuilder.h:20) and a bounded
5-frame history (`TrackingFrameHistory = historical_queue<HistoricalFrame, 5>`,
Tracking/PoseEstimator.h:53). Fixed-shape equivalents:

  - TrackedFrame: the current frame's features + pose + per-feature map-point
    association (N-sized arrays)
  - TrackingHistory: ring buffer of the last H tracked frames' poses,
    timestamps and associations (for the motion model and pose-estimation
    reference points)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose


class TrackedFrame(NamedTuple):
    """The in-flight frame (KeyframeBuilder equivalent)."""

    pose: Pose              # current world→camera estimate
    cam: jax.Array          # (4,) fx fy cx cy (undistorted space)
    kp_xy: jax.Array        # (N, 2) undistorted keypoint positions
    kp_octave: jax.Array    # (N,) int32
    desc: jax.Array         # (N, 8) uint32
    kp_valid: jax.Array     # (N,) bool
    assoc: jax.Array        # (N,) int32 → map point slot or -1
    timestamp: jax.Array    # () f32 seconds
    frame_id: jax.Array     # () int32

    def associated_count(self) -> jax.Array:
        return jnp.sum((self.assoc >= 0) & self.kp_valid)

    def clear_associations(self) -> "TrackedFrame":
        return self._replace(assoc=jnp.full_like(self.assoc, -1))


class TrackingHistory(NamedTuple):
    """Ring buffer of the last H tracked frames (newest at index 0).

    `assoc` keeps each historical frame's feature→map-point table so the pose
    estimator can project "the points the previous frames saw"
    (PoseEstimator.cpp:470-497); `valid` marks slots actually filled.
    """

    poses: Pose             # (H,) view transforms (UpdatedPose)
    timestamps: jax.Array   # (H,) f32
    assoc: jax.Array        # (H, N) int32
    kp_xy: jax.Array        # (H, N, 2) f32
    octave: jax.Array       # (H, N) int32 — keypoint pyramid levels (the
                            # guided cascade queries same-octave only:
                            # KeypointSpatialIndex octaveSpacing=100 vs
                            # octaveQueryRange=1, KeypointSpatialIndex.h:36-37)
    desc: jax.Array         # (H, N, 8) uint32
    valid: jax.Array        # (H,) bool

    @staticmethod
    def empty(length: int, n_features: int) -> "TrackingHistory":
        return TrackingHistory(
            poses=Pose.identity((length,)),
            timestamps=jnp.zeros((length,), jnp.float32),
            assoc=jnp.full((length, n_features), -1, jnp.int32),
            kp_xy=jnp.zeros((length, n_features, 2), jnp.float32),
            octave=jnp.zeros((length, n_features), jnp.int32),
            desc=jnp.zeros((length, n_features, 8), jnp.uint32),
            valid=jnp.zeros((length,), bool),
        )

    def advance(self, frame: TrackedFrame) -> "TrackingHistory":
        """Push the newest tracked frame (historical_queue::advance)."""
        roll = lambda a, v: jnp.concatenate([v[None], a[:-1]], axis=0)
        return TrackingHistory(
            poses=Pose(roll(self.poses.R, frame.pose.R), roll(self.poses.t, frame.pose.t)),
            timestamps=roll(self.timestamps, frame.timestamp),
            assoc=roll(self.assoc, frame.assoc),
            kp_xy=roll(self.kp_xy, frame.kp_xy),
            octave=roll(self.octave, frame.kp_octave),
            desc=roll(self.desc, frame.desc),
            valid=roll(self.valid, jnp.asarray(True)),
        )

    def clear(self) -> "TrackingHistory":
        """Tracking lost → history reset (TrackLocalMapWorker.cpp:87-90)."""
        return self._replace(valid=jnp.zeros_like(self.valid))
