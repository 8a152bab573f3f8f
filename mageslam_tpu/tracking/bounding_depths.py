"""Bounding-plane depth estimation per tracked frame.

Replaces Tracking/BoundingPlaneDepths.{h,cpp}: near/far plane depths from the
frame's associated map points whose keypoints fall in the central region of
interest (BoundingDepthSettings ROI, MageSettings.h:216-223), measured along
the viewing direction. Feeds the pose history's depth record, the VOI
teardrop kernels, and the keyframe decision's moved-enough test.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..worldmap.map_state import MapState
from .frame_state import TrackedFrame


class InternalDepth(NamedTuple):
    near: jax.Array    # () f32
    far: jax.Array     # () f32
    count: jax.Array   # () int32 — points inside the ROI


def calculate_bounding_plane_depths(
    frame: TrackedFrame,
    state: MapState,
    image_width: float,
    image_height: float,
    roi_min_x: float = 0.1,
    roi_min_y: float = 0.1,
    roi_max_x: float = 0.9,
    roi_max_y: float = 0.9,
    near_softness: float = 0.0,
    far_softness: float = 0.0,
) -> InternalDepth:
    """CalculateBoundingPlaneDepthsForKeyframe, batched over all associations.
    Softness in [0, 0.5) trims that quantile off each end (the reference's
    Near/FarDepthSoftness settings)."""
    a_ok = (frame.assoc >= 0) & frame.kp_valid
    safe = jnp.where(a_ok, frame.assoc, 0)
    a_ok = a_ok & state.mp_valid[safe]

    in_roi = (
        (frame.kp_xy[:, 0] >= roi_min_x * image_width)
        & (frame.kp_xy[:, 0] <= roi_max_x * image_width)
        & (frame.kp_xy[:, 1] >= roi_min_y * image_height)
        & (frame.kp_xy[:, 1] <= roi_max_y * image_height)
    )
    use = a_ok & in_roi

    f = frame.pose.forward()
    c = frame.pose.center()
    depth = jnp.einsum("ni,i->n", state.mp_pos[safe] - c[None], f)
    n = jnp.sum(use.astype(jnp.int32))

    # quantile trim via sort (fixed shape)
    d_sorted = jnp.sort(jnp.where(use, depth, jnp.inf))
    lo_idx = jnp.clip((near_softness * n.astype(jnp.float32)).astype(jnp.int32),
                      0, depth.shape[0] - 1)
    hi_idx = jnp.clip(n - 1 - (far_softness * n.astype(jnp.float32)).astype(jnp.int32),
                      0, depth.shape[0] - 1)
    near = d_sorted[lo_idx]
    far = d_sorted[hi_idx]
    ok = n > 0
    return InternalDepth(
        near=jnp.where(ok, near, 0.0),
        far=jnp.where(ok, jnp.where(jnp.isfinite(far), far, 0.0), 0.0),
        count=n,
    )
