"""New-keyframe decision gates (Tracking/NewKeyFrameDecision.cpp).

ORB-SLAM-style policy: enough frames since reloc/last keyframe, tracked-point
count in [min, max), either moved-enough-vs-min-depth or not densely
connected, and tracked points < Kref overlap bound. Counters
(frames-since-keyframe / since-reloc) live in the caller's pipeline state;
this module is pure.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose
from .frame_state import TrackedFrame


class KeyframeDecisionInput(NamedTuple):
    frames_since_keyframe: jax.Array        # () int32
    frames_since_reloc: jax.Array           # () int32
    mapping_idle: jax.Array                 # () bool
    min_point_distance: jax.Array           # () f32 — near bounding-plane depth


def moved_enough(frame_pose: Pose, connected_centers: jax.Array,
                 connected_mask: jax.Array, min_point_distance: jax.Array,
                 min_move_ratio: float) -> jax.Array:
    """True when the frame center is at least minDepth·ratio away from EVERY
    connected keyframe (NewKeyFrameDecision.cpp:41-63)."""
    min_d = min_point_distance * min_move_ratio
    d2 = jnp.sum((connected_centers - frame_pose.center()[None]) ** 2, axis=-1)
    too_close = connected_mask & (d2 < min_d * min_d)
    return jnp.logical_not(jnp.any(too_close))


def densely_connected(frame: TrackedFrame, image_width: float, image_height: float,
                      grid_w: int = 4, grid_h: int = 3,
                      min_points_per_cell: int = 2,
                      allowed_empty_pct: float = 0.25) -> jax.Array:
    """Grid coverage test (NewKeyFrameDecision.cpp:67-117): associated
    keypoints binned into a grid; frame is densely connected when the fraction
    of under-filled cells is within the allowance."""
    ok = (frame.assoc >= 0) & frame.kp_valid
    gx = jnp.clip(jnp.floor(frame.kp_xy[:, 0] * grid_w / image_width), 0, grid_w - 1)
    gy = jnp.clip(jnp.floor(frame.kp_xy[:, 1] * grid_h / image_height), 0, grid_h - 1)
    cell = (gx * grid_h + gy).astype(jnp.int32)
    counts = jnp.zeros((grid_w * grid_h,), jnp.int32).at[
        jnp.where(ok, cell, 0)
    ].add(ok.astype(jnp.int32))
    empty = jnp.sum((counts < min_points_per_cell).astype(jnp.float32))
    return empty / (grid_w * grid_h) <= allowed_empty_pct


def is_new_keyframe(
    frame: TrackedFrame,
    decision: KeyframeDecisionInput,
    connected_centers: jax.Array,    # (K, 3) covisible keyframe centers
    connected_mask: jax.Array,       # (K,) bool
    shared_counts: jax.Array,        # (K,) int32 — points shared with this frame
    connected_sizes: jax.Array,      # (K,) int32 — each keyframe's total point count
    image_width: float,
    image_height: float,
    min_frame_count: int = 60,
    min_frame_count_reloc: int = 20,
    min_tracking_points: int = 25,
    max_tracking_matches: int = 300,
    max_overlap: float = 0.25,
    min_move_ratio: float = 0.02,
    grid_w: int = 4,
    grid_h: int = 3,
    min_points_per_cell: int = 2,
    allowed_empty_pct: float = 0.25,
) -> jax.Array:
    """IsNewKeyFrame (NewKeyFrameDecision.cpp:141-…). Kref = the connected
    keyframe sharing the most points; accept when this frame's tracked count
    is below overlap·|Kref| + min (interpretation 2 in the reference's
    comment block)."""
    n_tracked = frame.associated_count()

    gate_reloc = decision.frames_since_reloc > min_frame_count_reloc
    gate_rate = decision.mapping_idle | (decision.frames_since_keyframe > min_frame_count)
    gate_min = n_tracked > min_tracking_points
    gate_max = n_tracked < max_tracking_matches

    moved = moved_enough(frame.pose, connected_centers, connected_mask,
                         decision.min_point_distance, min_move_ratio)
    dense = densely_connected(frame, image_width, image_height, grid_w, grid_h,
                              min_points_per_cell, allowed_empty_pct)
    gate_geom = moved | jnp.logical_not(dense)

    best = jnp.argmax(jnp.where(connected_mask, shared_counts, -1))
    n_kref = jnp.where(jnp.any(connected_mask), connected_sizes[best], 0)
    gate_overlap = n_tracked.astype(jnp.float32) < (
        n_kref.astype(jnp.float32) * max_overlap + min_tracking_points
    )

    return gate_reloc & gate_rate & gate_min & gate_max & gate_geom & gate_overlap
