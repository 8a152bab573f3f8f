"""Reprojection / tether residuals with analytic Jacobians, batched over
all observations at once.

Semantics mirror g2o as driven by BundlerLib:
  - observation error  e = obs_uv - project(K, T·X)   (EdgeProjectXYZ2UV)
  - information        Ω = info · I₂                  (BundlerLib.cpp:316-318)
  - Huber robustifier with width δ: weight ρ'(χ²) = 1 if χ² ≤ δ², else δ/√χ²
    (g2o RobustKernelHuber; χ² = e^T Ω e)
  - distance tether    e = (d_meas - |t₂ - t₁|)·w    (EdgeScaleConstraint,
    BundlerLib.cpp:30-55 — note: view-transform translations, not centers)
  - rotation tether    e = ∠(R₁R₂ᵀ delta) · w        (EdgeRotationConstraint)
  - transform tether   e = log(T₂⁻¹ · ΔT · T₁)       (g2o EdgeSE3Expmap), Ω = w·I₆

Pose updates are left-multiplicative: T ← exp([ρ,φ])·T (geometry.se3.retract),
so dX_cam/dξ = [I₃ | -[X_cam]ₓ].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, exp_se3, hat, log_se3
from .problem import BAProblem, TETHER_DISTANCE, TETHER_ROTATION, TETHER_TRANSFORM

_EPS = 1e-12


class ObsResiduals(NamedTuple):
    r: jax.Array        # (O, 2) residuals e = obs - proj
    Jc: jax.Array       # (O, 2, 6) d e / d camera twist [rho, phi]
    Jp: jax.Array       # (O, 2, 3) d e / d point
    w: jax.Array        # (O,) total scalar weight: info * huber ρ' (0 for invalid)
    chi2: jax.Array     # (O,) e^T Ω e (information-scaled, pre-robustifier)
    depth: jax.Array    # (O,) z in camera frame (cheirality)


def project_obs(poses: Pose, intrinsics: jax.Array, points: jax.Array,
                obs_cam: jax.Array, obs_pt: jax.Array):
    """Project each observation's point into its camera. Returns (uv, Xc)."""
    R = poses.R[obs_cam]            # (O, 3, 3)
    t = poses.t[obs_cam]            # (O, 3)
    X = points[obs_pt]              # (O, 3)
    Xc = jnp.einsum("oij,oj->oi", R, X) + t
    K = intrinsics[obs_cam]         # (O, 4)
    z = Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    u = K[:, 0] * Xc[:, 0] * inv_z + K[:, 2]
    v = K[:, 1] * Xc[:, 1] * inv_z + K[:, 3]
    return jnp.stack([u, v], axis=-1), Xc


def observation_residuals(problem: BAProblem, poses: Pose, points: jax.Array,
                          obs_info: jax.Array, huber_width: jax.Array) -> ObsResiduals:
    """All observation residuals + Jacobians in one batched evaluation."""
    uv, Xc = project_obs(poses, problem.intrinsics, points, problem.obs_cam, problem.obs_pt)
    r = problem.obs_uv - uv                                   # (O, 2)

    K = problem.intrinsics[problem.obs_cam]
    fx, fy = K[:, 0], K[:, 1]
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
    inv_z2 = inv_z * inv_z

    # d proj / d X_cam, (O, 2, 3); d e = -d proj
    zeros = jnp.zeros_like(fx)
    dproj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    # dX_cam/dξ = [I | -[Xc]x]  (left-multiplicative update)
    dXc_dxi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3)), -hat(Xc)],
        axis=-1,
    )  # (O, 3, 6)
    Jc = -jnp.einsum("oij,ojk->oik", dproj, dXc_dxi)          # (O, 2, 6)
    Jp = -jnp.einsum("oij,ojk->oik", dproj, poses.R[problem.obs_cam])  # (O, 2, 3)

    chi2 = obs_info * jnp.sum(r * r, axis=-1)
    # Huber ρ': 1 inside the width, δ/√χ² outside (δ=0 ⇒ plain least squares)
    sqrt_chi2 = jnp.sqrt(chi2 + _EPS)
    use_huber = huber_width > 0.0
    rho_p = jnp.where(
        jnp.logical_and(use_huber, chi2 > huber_width * huber_width),
        huber_width / sqrt_chi2,
        1.0,
    )
    w = obs_info * rho_p
    # guard: invalid cameras/points contribute nothing
    valid = (
        (obs_info > 0)
        & problem.cam_valid[problem.obs_cam]
        & problem.pt_valid[problem.obs_pt]
    )
    w = jnp.where(valid, w, 0.0)
    return ObsResiduals(r=r, Jc=Jc, Jp=Jp, w=w, chi2=chi2, depth=z)


def behind_camera(res: ObsResiduals) -> jax.Array:
    """Cheirality outlier test. The reference checks the dot of the camera's
    world forward axis with (X - C) (BundlerLib.cpp:400-417) — identical to
    camera-frame z ≤ 0."""
    return res.depth <= 0.0


class TetherResiduals(NamedTuple):
    r: jax.Array        # (T, 6) residual, zero-padded for 1-dim kinds
    Jc1: jax.Array      # (T, 6, 6) d r / d twist of cam1
    Jc2: jax.Array      # (T, 6, 6) d r / d twist of cam2
    w: jax.Array        # (T,) information scalar
    chi2: jax.Array     # (T,)


def tether_residuals(problem: BAProblem, poses: Pose) -> TetherResiduals:
    """All tether kinds evaluated branchlessly and masked by kind.

    Jacobians computed with jax.jacfwd over the twist perturbations — tethers
    are few (T ≲ 8) and rare, so autodiff cost is negligible next to the
    observation blocks, and it is exact for all three kinds at once.
    """
    T = problem.tether_cam1.shape[0]
    if T == 0:
        z6 = jnp.zeros((0, 6))
        return TetherResiduals(z6, jnp.zeros((0, 6, 6)), jnp.zeros((0, 6, 6)),
                               jnp.zeros((0,)), jnp.zeros((0,)))

    p1 = Pose(poses.R[problem.tether_cam1], poses.t[problem.tether_cam1])
    p2 = Pose(poses.R[problem.tether_cam2], poses.t[problem.tether_cam2])

    def residual(xi1, xi2, p1R, p1t, p2R, p2t, kind, meas_R, meas_t, meas_d, w):
        T1 = exp_se3(xi1).compose(Pose(p1R, p1t))
        T2 = exp_se3(xi2).compose(Pose(p2R, p2t))
        # DISTANCE: (d - |t2 - t1|) * w   (BundlerLib.cpp:44-49)
        dt = T2.t - T1.t
        r_dist = (meas_d - jnp.sqrt(jnp.sum(dt * dt) + _EPS)) * w
        # ROTATION: angular distance between (T1⁻¹ T2).R and meas_R, * w
        R_rel = jnp.matmul(jnp.swapaxes(T1.R, -1, -2), T2.R)
        dR = jnp.matmul(R_rel, jnp.swapaxes(meas_R, -1, -2))
        cos_a = jnp.clip((dR[0, 0] + dR[1, 1] + dR[2, 2] - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
        r_rot = jnp.arccos(cos_a) * w
        # TRANSFORM: log(T2⁻¹ · ΔT · T1), Ω = w I₆ (g2o EdgeSE3Expmap)
        delta = Pose(meas_R, meas_t)
        err_pose = T2.inverse().compose(delta).compose(T1)
        r_xform = log_se3(err_pose)
        r6 = jnp.where(
            kind == TETHER_DISTANCE,
            jnp.concatenate([r_dist[None], jnp.zeros((5,))]),
            jnp.where(
                kind == TETHER_ROTATION,
                jnp.concatenate([r_rot[None], jnp.zeros((5,))]),
                r_xform,
            ),
        )
        return r6

    zero6 = jnp.zeros((T, 6))
    args = (p1.R, p1.t, p2.R, p2.t, problem.tether_kind,
            problem.tether_pose.R, problem.tether_pose.t,
            problem.tether_distance, problem.tether_weight)
    r = jax.vmap(residual, in_axes=(0,) * 11)(zero6, zero6, *args)
    Jc1 = jax.vmap(jax.jacfwd(residual, argnums=0), in_axes=(0,) * 11)(zero6, zero6, *args)
    Jc2 = jax.vmap(jax.jacfwd(residual, argnums=1), in_axes=(0,) * 11)(zero6, zero6, *args)

    # information: TRANSFORM kind has Ω = w I (weight inside info); 1-dim kinds
    # already multiplied w into the residual, so their info is 1 (masked by validity)
    valid = problem.tether_weight > 0
    w_info = jnp.where(problem.tether_kind == TETHER_TRANSFORM, problem.tether_weight, 1.0)
    w_info = jnp.where(valid, w_info, 0.0)
    chi2 = w_info * jnp.sum(r * r, axis=-1)
    return TetherResiduals(r=r, Jc1=Jc1, Jc2=Jc2, w=w_info, chi2=chi2)


def robust_cost(chi2: jax.Array, huber_width: jax.Array, valid_w: jax.Array) -> jax.Array:
    """Exact Huber cost Σ ρ(χ²) over valid observations."""
    delta2 = huber_width * huber_width
    use_huber = huber_width > 0.0
    rho = jnp.where(
        jnp.logical_and(use_huber, chi2 > delta2),
        2.0 * huber_width * jnp.sqrt(chi2 + _EPS) - delta2,
        chi2,
    )
    return jnp.sum(jnp.where(valid_w > 0, rho, 0.0))
