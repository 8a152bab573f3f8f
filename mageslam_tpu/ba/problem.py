"""Fixed-shape bundle-adjustment problem container.

Mirrors the data BundlerLib accepts (Dependencies/BundlerLib/Include/BundlerLib.h:27-49:
cameras, map points, observations with per-observation information scalar, and
distance / relative-rotation / relative-transform tether constraints) as padded
arrays with validity masks — the TPU-native form of `AdjustableData`
(Core/MAGESLAM/Source/BundleAdjustment/BundleAdjust.h:42-56).

All index arrays point into the padded camera/point banks; invalid slots carry
index 0 and weight 0 so gathers stay in-bounds and scatters are no-ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose

# tether kinds (Data/Tether.h:12-68: DISTANCE, THREE_DOF, ROTATION, EXTRINSIC)
TETHER_DISTANCE = 0
TETHER_ROTATION = 1
TETHER_TRANSFORM = 2


class BAProblem(NamedTuple):
    """Padded BA problem. Shapes: K cameras, P points, O observations, T tethers."""

    # cameras
    poses: Pose                 # R (K,3,3), t (K,3) world→camera
    intrinsics: jax.Array       # (K, 4) fx, fy, cx, cy (undistorted space —
                                # BundlerLib.h:29-31 takes a Vector4f)
    cam_fixed: jax.Array        # (K,) bool — fixed vertices (BundlerLib.h:33)
    cam_valid: jax.Array        # (K,) bool — slot in use

    # points
    points: jax.Array           # (P, 3) world positions
    pt_valid: jax.Array         # (P,) bool

    # observations (EdgeProjectXYZ2UV + Huber kernel, BundlerLib.cpp:296-331)
    obs_cam: jax.Array          # (O,) int32 → camera slot
    obs_pt: jax.Array           # (O,) int32 → point slot
    obs_uv: jax.Array           # (O, 2) f32 measured undistorted pixel coords
    obs_info: jax.Array         # (O,) f32 information scalar (0 = invalid/removed)

    # tethers (all three constraint kinds in one bank)
    tether_kind: jax.Array      # (T,) int32 TETHER_*
    tether_cam1: jax.Array      # (T,) int32
    tether_cam2: jax.Array      # (T,) int32
    tether_pose: Pose           # (T,3,3),(T,3) measured delta (cam1→cam2);
                                # distance tethers store it in t[...,0]... see below
    tether_distance: jax.Array  # (T,) f32 measured distance (DISTANCE kind)
    tether_weight: jax.Array    # (T,) f32 (0 = invalid)

    points_fixed: bool = False  # BundlerParameters::ArePointsFixed

    @property
    def num_cameras(self) -> int:
        return self.poses.t.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_observations(self) -> int:
        return self.obs_cam.shape[0]


def empty_problem(
    n_cams: int, n_points: int, n_obs: int, n_tethers: int = 8, points_fixed: bool = False
) -> BAProblem:
    """All-invalid problem of the given static capacities."""
    return BAProblem(
        poses=Pose.identity((n_cams,)),
        intrinsics=jnp.tile(jnp.array([[1.0, 1.0, 0.0, 0.0]], jnp.float32), (n_cams, 1)),
        cam_fixed=jnp.zeros((n_cams,), bool),
        cam_valid=jnp.zeros((n_cams,), bool),
        points=jnp.zeros((n_points, 3), jnp.float32),
        pt_valid=jnp.zeros((n_points,), bool),
        obs_cam=jnp.zeros((n_obs,), jnp.int32),
        obs_pt=jnp.zeros((n_obs,), jnp.int32),
        obs_uv=jnp.zeros((n_obs, 2), jnp.float32),
        obs_info=jnp.zeros((n_obs,), jnp.float32),
        tether_kind=jnp.zeros((n_tethers,), jnp.int32),
        tether_cam1=jnp.zeros((n_tethers,), jnp.int32),
        tether_cam2=jnp.zeros((n_tethers,), jnp.int32),
        tether_pose=Pose.identity((n_tethers,)),
        tether_distance=jnp.ones((n_tethers,), jnp.float32),
        tether_weight=jnp.zeros((n_tethers,), jnp.float32),
        points_fixed=points_fixed,
    )


class BAState(NamedTuple):
    """Mutable-across-steps optimizer state: variables + persisted LM lambda
    (BundlerLib::Set/GetCurrentLambda, BundlerLib.cpp:354-362 — MappingWorker
    persists lambda across incremental runs, Tasks/MappingWorker.cpp:272-286)."""

    poses: Pose
    points: jax.Array
    lam: jax.Array        # () f32 current LM lambda; <=0 means "initialize from H"
    ni: jax.Array         # () f32 lambda growth factor (g2o `_ni`)
    obs_info: jax.Array   # (O,) f32 — outlier removal zeroes entries

    @staticmethod
    def from_problem(p: BAProblem, user_lambda: float | jax.Array = -1.0) -> "BAState":
        return BAState(
            poses=p.poses,
            points=p.points,
            lam=jnp.asarray(user_lambda, jnp.float32),
            ni=jnp.asarray(2.0, jnp.float32),
            obs_info=p.obs_info,
        )
