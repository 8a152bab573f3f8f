"""Motion-only (pose-only) Levenberg-Marquardt — the tracking hot path.

Replaces TrackLocalMap::OptimizeCameraPose (Tracking/TrackLocalMap.cpp:421-…)
and PoseEstimator's pose-only BA (Tracking/PoseEstimator.cpp:168-207): one
camera vertex, all map points fixed, Huber-robustified reprojection edges.
g2o solves this with BlockSolver_6_3 + LinearSolverDense; here the normal
equations are a single 6×6 system assembled by one batched reduction over all
observations — ideal TPU shape (a (N,2,6) Jacobian contraction on the MXU).

LM policy mirrors g2o's OptimizationAlgorithmLevenberg:
  λ₀ = 1e-5 · max(diag H)  (or user λ), gain ratio ρ accept/reject,
  accept: λ ← λ·max(⅓, 1-(2ρ-1)³), ν=2;  reject: λ ← λ·ν, ν ← 2ν.

Everything is fixed-shape and vmap-able over a batch of frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, hat, retract

_EPS = 1e-12


def _pose_residuals(pose: Pose, intrinsics: jax.Array, points: jax.Array,
                    uv: jax.Array, info: jax.Array, huber_width: jax.Array):
    """Residuals/Jacobian/weights for one camera vs fixed points.

    Returns r (N,2), J (N,2,6), w (N,), chi2 (N,), depth (N,).
    """
    Xc = jnp.einsum("ij,nj->ni", pose.R, points) + pose.t
    z = Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    u = fx * Xc[:, 0] * inv_z + cx
    v = fy * Xc[:, 1] * inv_z + cy
    r = uv - jnp.stack([u, v], axis=-1)

    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(z)
    dproj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * Xc[:, 0] * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * Xc[:, 1] * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    dXc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3)), -hat(Xc)],
        axis=-1,
    )  # (N, 3, 6)
    J = -jnp.einsum("nij,njk->nik", dproj, dXc_dxi)  # (N, 2, 6)

    chi2 = info * jnp.sum(r * r, axis=-1)
    sqrt_chi2 = jnp.sqrt(chi2 + _EPS)
    use_huber = huber_width > 0.0
    rho_p = jnp.where(
        jnp.logical_and(use_huber, chi2 > huber_width * huber_width),
        huber_width / sqrt_chi2,
        1.0,
    )
    w = jnp.where(info > 0, info * rho_p, 0.0)
    return r, J, w, chi2, z


def _robust_cost(chi2: jax.Array, info: jax.Array, huber_width: jax.Array) -> jax.Array:
    delta2 = huber_width * huber_width
    rho = jnp.where(
        jnp.logical_and(huber_width > 0.0, chi2 > delta2),
        2.0 * huber_width * jnp.sqrt(chi2 + _EPS) - delta2,
        chi2,
    )
    return jnp.sum(jnp.where(info > 0, rho, 0.0))


@partial(jax.jit, static_argnames=("num_iters",))
def optimize_pose(
    pose: Pose,
    intrinsics: jax.Array,   # (4,) fx fy cx cy — undistorted pinhole space
    points: jax.Array,       # (N, 3) fixed world points
    uv: jax.Array,           # (N, 2) measured undistorted pixels
    info: jax.Array,         # (N,) information scalars, 0 = masked out
    huber_width: float | jax.Array = 1.8,
    num_iters: int = 10,
) -> tuple[Pose, jax.Array, jax.Array]:
    """Run LM on a single camera pose. Returns (pose, chi2 (N,), depth (N,)).

    chi2/depth are evaluated at the final pose for the caller's outlier pass
    (TrackLocalMap.cpp:120-147 unassociates outliers between the two stages).
    """
    huber_width = jnp.asarray(huber_width, jnp.float32)

    def build(p: Pose):
        """ONE residual evaluation → (H, b, cost). The LM loop below carries
        the accepted iterate's (H, b, cost) so each iteration evaluates the
        residuals exactly once (a rejected trial reuses the carried system)."""
        r, J, w, chi2, _ = _pose_residuals(p, intrinsics, points, uv, info, huber_width)
        # H = Σ w Jᵀ J, b = -Σ w Jᵀ r   (g2o convention: b = -Jᵀ Ω e, solve H Δx = b)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J)
        b = -jnp.einsum("nij,ni->j", Jw, r)
        return H, b, _robust_cost(chi2, info, huber_width)

    H0, b0, cost0 = build(pose)
    lam0 = 1e-5 * jnp.max(jnp.diagonal(H0))

    def step(carry, _):
        p, lam, ni, cost, H, b = carry
        Hd = H + lam * jnp.eye(6, dtype=H.dtype)
        dx = jnp.linalg.solve(Hd, b)
        p_new = retract(p, dx)
        H_new, b_new, cost_new = build(p_new)
        # g2o gain ratio: scale = dxᵀ(λ dx + b)
        scale = jnp.dot(dx, lam * dx + b) + _EPS
        rho = (cost - cost_new) / scale
        ok = jnp.logical_and(jnp.isfinite(cost_new), rho > 0)
        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        pick = lambda a, b_: jnp.where(ok, a, b_)
        return (
            jax.tree.map(pick, p_new, p),
            jnp.where(ok, lam_acc, lam * ni),
            jnp.where(ok, 2.0, ni * 2.0),
            jnp.where(ok, cost_new, cost),
            pick(H_new, H),
            pick(b_new, b),
        ), None

    (pose_f, _, _, _, _, _), _ = jax.lax.scan(
        step, (pose, lam0, jnp.float32(2.0), cost0, H0, b0), None, length=num_iters
    )
    _, _, _, chi2_f, depth_f = _pose_residuals(
        pose_f, intrinsics, points, uv, info, huber_width
    )
    return pose_f, chi2_f, depth_f


optimize_pose_batch = jax.vmap(
    optimize_pose, in_axes=(0, 0, 0, 0, 0, None, None), out_axes=0
)
"""Batched over frames: Pose (B,...), intrinsics (B,4), points (B,N,3), ..."""
