"""Batched triangulation and reprojection.

Reproduces the reference's midpoint triangulation
(Tracking/Triangulation.cpp TriangulatePointWorldSpace: closest point between the
two back-projected world rays, midpoint of the connecting segment) plus a DLT
variant (cv::triangulatePoints analog) — both fully batched over N matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import Pose

_SMALL = 1e-5


def backproject_rays(cam: jax.Array, pose: Pose, px: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pixels (..., 2) → (origin (...,3), world-space ray direction (...,3)).

    px must already be undistorted; cam provides the pinhole intrinsics.
    """
    xn = jnp.stack(
        [
            (px[..., 0] - cam[..., 2]) / cam[..., 0],
            (px[..., 1] - cam[..., 3]) / cam[..., 1],
            jnp.ones_like(px[..., 0]),
        ],
        axis=-1,
    )
    Rt = jnp.swapaxes(pose.R, -1, -2)
    d = jnp.einsum("...ij,...j->...i", Rt, xn)
    origin = jnp.broadcast_to(pose.center(), d.shape)
    return origin, d


def triangulate_midpoint(
    cam1: jax.Array,
    pose1: Pose,
    px1: jax.Array,
    cam2: jax.Array,
    pose2: Pose,
    px2: jax.Array,
) -> jax.Array:
    """Midpoint triangulation of undistorted pixel matches, batched over leading dims.

    Mirrors Triangulation.cpp:24-61: u,v are (non-normalized) ray directions,
    closest-approach parameters solved in closed form; near-parallel rays fall back
    to sc=0, tc from the larger denominator.
    """
    o1, u = backproject_rays(cam1, pose1, px1)
    o2, v = backproject_rays(cam2, pose2, px2)
    w = o1 - o2
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    D = a * c - b * b
    parallel = D < _SMALL
    sc = jnp.where(parallel, 0.0, (b * e - c * d) / jnp.where(parallel, 1.0, D))
    tc_par = jnp.where(b > c, d / jnp.where(jnp.abs(b) < 1e-12, 1e-12, b),
                       e / jnp.where(jnp.abs(c) < 1e-12, 1e-12, c))
    tc = jnp.where(parallel, tc_par, (a * e - b * d) / jnp.where(parallel, 1.0, D))
    p1 = o1 + sc[..., None] * u
    p2 = o2 + tc[..., None] * v
    return 0.5 * (p1 + p2)


def triangulate_dlt(
    cam1: jax.Array,
    pose1: Pose,
    px1: jax.Array,
    cam2: jax.Array,
    pose2: Pose,
    px2: jax.Array,
) -> jax.Array:
    """Two-view DLT triangulation (cv::triangulatePoints analog), batched.

    Works in *normalized camera coordinates* (pixels pre-divided by K) so the
    4x3 system is well-scaled for f32, then solves via 3x3 normal equations.
    """

    def rt_matrix(pose):
        return jnp.concatenate([pose.R, pose.t[..., :, None]], axis=-1)  # (...,3,4)

    P1 = rt_matrix(pose1)
    P2 = rt_matrix(pose2)
    rows = []
    for P, cam, px in ((P1, cam1, px1), (P2, cam2, px2)):
        xn = jnp.stack(
            [
                (px[..., 0] - cam[..., 2]) / cam[..., 0],
                (px[..., 1] - cam[..., 3]) / cam[..., 1],
            ],
            axis=-1,
        )
        P = jnp.broadcast_to(P, px.shape[:-1] + (3, 4))
        rows.append(xn[..., 0:1] * P[..., 2, :] - P[..., 0, :])
        rows.append(xn[..., 1:2] * P[..., 2, :] - P[..., 1, :])
    A = jnp.stack(rows, axis=-2)  # (...,4,4)
    # homogeneous solve: minimize |A x| with x = [X, 1]: A3 X = -a4
    A3 = A[..., :3]
    a4 = A[..., 3]
    AtA = jnp.einsum("...ki,...kj->...ij", A3, A3)
    Atb = -jnp.einsum("...ki,...k->...i", A3, a4)
    eye = jnp.eye(3, dtype=A.dtype) * 1e-9
    return jnp.linalg.solve(AtA + eye, Atb[..., None])[..., 0]


def reprojection_error(
    cam: jax.Array, pose: Pose, pts_world: jax.Array, px: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Undistorted reprojection error (pixels) and depth, batched.
    Mirrors Tracking/Reprojection.cpp ProjectUndistorted."""
    pc = pose.transform(pts_world)
    z = pc[..., 2]
    div = jnp.where(z == 0, 1.0, z)
    u = pc[..., 0] / div * cam[..., 0] + cam[..., 2]
    v = pc[..., 1] / div * cam[..., 1] + cam[..., 3]
    err = jnp.sqrt((u - px[..., 0]) ** 2 + (v - px[..., 1]) ** 2)
    return err, z
