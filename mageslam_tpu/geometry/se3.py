"""SE(3) / SO(3) operations, batched and jit-friendly.

The reference represents a camera pose as a world→camera "view matrix" plus
quaternion accessors (Core/MAGESLAM/Source/Data/Pose.h). Here a `Pose` is a
pytree of a rotation matrix `R` (..., 3, 3) and translation `t` (..., 3) with
the same world→camera convention:

    x_cam = R @ x_world + t        camera center C = -R^T t

All functions broadcast over leading batch dimensions — poses are
struct-of-arrays so a keyframe bank is just Pose(R=(K,3,3), t=(K,3)).

LM pose updates use the g2o convention (VertexSE3Expmap::oplusImpl):
left-multiplication of the view transform by exp of a twist,
T_new = exp(delta) * T, with twist ordering [rho(3), phi(3)] = [trans, rot].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class Pose(NamedTuple):
    """World→camera rigid transform (view transform). R: (...,3,3), t: (...,3)."""

    R: jax.Array
    t: jax.Array

    @staticmethod
    def identity(batch_shape: tuple[int, ...] = (), dtype=jnp.float32) -> "Pose":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return Pose(R, t)

    def matrix(self) -> jax.Array:
        """4x4 homogeneous view matrix (world→camera)."""
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.R.dtype),
            self.R.shape[:-2] + (1, 4),
        )
        top = jnp.concatenate([self.R, self.t[..., :, None]], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)

    @staticmethod
    def from_matrix(m: jax.Array) -> "Pose":
        return Pose(m[..., :3, :3], m[..., :3, 3])

    def inverse(self) -> "Pose":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return Pose(Rt, -jnp.einsum("...ij,...j->...i", Rt, self.t))

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: apply `other` first, then `self`."""
        return Pose(
            jnp.einsum("...ij,...jk->...ik", self.R, other.R),
            jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def transform(self, pts: jax.Array) -> jax.Array:
        """Apply to world points (..., 3) → camera-frame points."""
        return jnp.einsum("...ij,...j->...i", self.R, pts) + self.t

    def center(self) -> jax.Array:
        """Camera center in world coordinates (Pose::GetWorldSpacePosition)."""
        return -jnp.einsum("...ji,...j->...i", self.R, self.t)

    def forward(self) -> jax.Array:
        """World-space viewing direction (+Z row of R — Pose::GetWorldSpaceForward)."""
        return self.R[..., 2, :]


def hat(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]_x of (...,3) vectors."""
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def exp_so3(phi: jax.Array) -> jax.Array:
    """Rodrigues: (...,3) rotation vector → (...,3,3) rotation matrix.

    Uses Taylor-safe coefficients so gradients are stable at phi→0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # sin(x)/x and (1-cos x)/x^2 with series fallback near 0
    small = theta < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    K = hat(phi)
    KK = jnp.einsum("...ij,...jk->...ik", K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def log_so3(R: jax.Array) -> jax.Array:
    """Rotation matrix → rotation vector (principal branch, |phi| <= pi).

    Autodiff-safe at the identity: arccos and the π-branch sqrt receive
    sanitized inputs in the branches that `where` discards (the standard
    double-where trick — NaN in an unselected branch still poisons gradients).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    near_zero = cos_theta > 1.0 - 1e-7
    safe_cos = jnp.where(near_zero, 0.0, cos_theta)      # d/dx arccos finite
    theta = jnp.where(near_zero, 0.0, jnp.arccos(safe_cos))
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    # w = 2 sin(theta) * axis; phi = theta * axis
    safe_sin = jnp.where(small, 1.0, sin_theta)
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * safe_sin))
    phi = w * scale[..., None]
    # Near theta = pi, w → 0; recover axis from diagonal of R.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.maximum(
        (diag - cos_theta[..., None]) / (1.0 - cos_theta[..., None] + _EPS), 0.0)
    axis = jnp.sqrt(jnp.where(near_pi[..., None], axis_sq, 1.0))
    # fix signs using off-diagonal sums (sign of w components where nonzero)
    sign = jnp.where(w >= 0, 1.0, -1.0)
    phi_pi = axis * sign * theta[..., None]
    return jnp.where(near_pi[..., None], phi_pi, phi)


def _so3_left_jacobian(phi: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3) (for the SE(3) exp translation part)."""
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta < 1e-4
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta + _EPS)
    )
    K = hat(phi)
    KK = jnp.einsum("...ij,...jk->...ik", K, K)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def exp_se3(twist: jax.Array) -> Pose:
    """SE(3) exponential. twist = [rho(3), phi(3)] (translation first — g2o order
    is [omega, upsilon] internally but BundlerLib exposes per-axis blocks; we fix
    [rho, phi] throughout this codebase)."""
    rho, phi = twist[..., :3], twist[..., 3:]
    R = exp_so3(phi)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(phi), rho)
    return Pose(R, t)


def log_se3(pose: Pose) -> jax.Array:
    phi = log_so3(pose.R)
    Jl = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(Jl, pose.t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def retract(pose: Pose, twist: jax.Array) -> Pose:
    """LM update: T_new = exp(twist) ∘ T (g2o VertexSE3Expmap::oplusImpl)."""
    return exp_se3(twist).compose(pose)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion (w, x, y, z) → rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / (n + _EPS)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix → unit quaternion (w, x, y, z), branchless Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # four squared-magnitude candidates
    qw2 = jnp.maximum(0.0, 1.0 + m00 + m11 + m22)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)
    qw = jnp.sqrt(qw2) * 0.5
    qx = jnp.sqrt(qx2) * 0.5
    qy = jnp.sqrt(qy2) * 0.5
    qz = jnp.sqrt(qz2) * 0.5
    # pick the largest for numeric stability
    cands = jnp.stack(
        [
            jnp.stack([qw, (m21 - m12) / (4 * qw + _EPS), (m02 - m20) / (4 * qw + _EPS), (m10 - m01) / (4 * qw + _EPS)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * qx + _EPS), qx, (m01 + m10) / (4 * qx + _EPS), (m02 + m20) / (4 * qx + _EPS)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * qy + _EPS), (m01 + m10) / (4 * qy + _EPS), qy, (m12 + m21) / (4 * qy + _EPS)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * qz + _EPS), (m02 + m20) / (4 * qz + _EPS), (m12 + m21) / (4 * qz + _EPS), qz], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 candidates, 4)
    idx = jnp.argmax(jnp.stack([qw2, qx2, qy2, qz2], axis=-1), axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] >= 0, 1.0, -1.0)


def quat_mul(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (w, x, y, z), broadcasting."""
    w0, x0, y0, z0 = q0[..., 0], q0[..., 1], q0[..., 2], q0[..., 3]
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    return jnp.stack(
        [
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions) of (w, x, y, z)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], q.dtype)


def slerp(q0: jax.Array, q1: jax.Array, alpha: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions (w,x,y,z)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-5
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1.0 - alpha) * theta) / (sin_theta + _EPS))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / (sin_theta + _EPS))
    q = w0 * q0 + w1 * q1
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + _EPS)


def interpolate_pose(p0: Pose, p1: Pose, alpha: jax.Array) -> Pose:
    """Interpolate view transforms: slerp rotation, lerp camera center
    (matches the motion-model extrapolation style of PoseEstimator.cpp:89-133)."""
    q = slerp(rot_to_quat(p0.R), rot_to_quat(p1.R), alpha)
    R = quat_to_rot(q)
    c = (1.0 - alpha) * p0.center() + alpha * p1.center()
    t = -jnp.einsum("...ij,...j->...i", R, c)
    return Pose(R, t)
