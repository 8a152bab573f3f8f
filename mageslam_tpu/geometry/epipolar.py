"""Epipolar geometry: essential/fundamental matrices, point-line distances.

Mirrors Utils/Epipolar.cpp: the fundamental matrix between two calibrated frames
is K2^-T E K1^-1 with E = [t]_x R of the relative view transform, and the
epipolar test uses the distance of the frame-2 point from the epiline of the
frame-1 point, normalized by the line's (a, b) norm (DistanceFromEpipolarLine,
Epipolar.cpp:93-107). All ops are batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .se3 import Pose, hat


def relative_pose(from_pose: Pose, to_pose: Pose) -> Pose:
    """View transform taking from-frame camera coords to to-frame camera coords
    (Pose::GetRelativeViewMatrix): T_rel = T_to ∘ T_from^-1."""
    return to_pose.compose(from_pose.inverse())


def essential_matrix(from_pose: Pose, to_pose: Pose) -> jax.Array:
    """E = [t]_x R of the relative transform (Epipolar.cpp:29-49)."""
    rel = relative_pose(from_pose, to_pose)
    return jnp.einsum("...ij,...jk->...ik", hat(rel.t), rel.R)


def fundamental_matrix(
    from_pose: Pose, from_cam: jax.Array, to_pose: Pose, to_cam: jax.Array
) -> jax.Array:
    """F = K_to^-T E K_from^-1 (Epipolar.cpp:14-25). cam vectors per camera.py."""
    E = essential_matrix(from_pose, to_pose)

    def inv_k(cam):
        fx, fy, cx, cy = cam[..., 0], cam[..., 1], cam[..., 2], cam[..., 3]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack(
            [
                jnp.stack([1.0 / fx, z, -cx / fx], axis=-1),
                jnp.stack([z, 1.0 / fy, -cy / fy], axis=-1),
                jnp.stack([z, z, o], axis=-1),
            ],
            axis=-2,
        )

    Kf_inv = inv_k(from_cam)
    Kt_inv_T = jnp.swapaxes(inv_k(to_cam), -1, -2)
    return jnp.einsum("...ij,...jk,...kl->...il", Kt_inv_T, E, Kf_inv)


def epiline(F: jax.Array, px1: jax.Array) -> jax.Array:
    """Epipolar line (a, b, c) in image 2 for points px1 (..., 2) in image 1."""
    p1h = jnp.stack([px1[..., 0], px1[..., 1], jnp.ones_like(px1[..., 0])], axis=-1)
    return jnp.einsum("...ij,...j->...i", F, p1h)


def distance_from_epipolar_line(F: jax.Array, px1: jax.Array, px2: jax.Array) -> jax.Array:
    """|a x2 + b y2 + c| / sqrt(a² + b²), with the reference's nu==0 → 1 guard."""
    line = epiline(F, px1)
    a, b, c = line[..., 0], line[..., 1], line[..., 2]
    nu = a * a + b * b
    inv_nu = jnp.where(nu > 0, 1.0 / jnp.sqrt(jnp.where(nu > 0, nu, 1.0)), 1.0)
    return jnp.abs(px2[..., 0] * a + px2[..., 1] * b + c) * inv_nu


def symmetric_transfer_error(F: jax.Array, px1: jax.Array, px2: jax.Array) -> jax.Array:
    """Sum of squared point-to-epiline distances in both images (used by the
    reference's fundamental-matrix scoring during map init,
    MapInitialization.cpp ScoreFundamentalMatrix)."""
    d2 = distance_from_epipolar_line(F, px1, px2)
    d1 = distance_from_epipolar_line(jnp.swapaxes(F, -1, -2), px2, px1)
    return d1 * d1 + d2 * d2
