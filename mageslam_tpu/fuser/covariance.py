"""Visual pose covariance from reprojection Jacobians.

Replaces Fuser::EstimatePoseCovariance + CalculateJacobian/CalculateResiduals
(Core/MAGESLAM/Source/Fuser/Fuser.cpp:300-400, Fuser.h:51-75): each tracked
association contributes the gradient of its squared reprojection error with
respect to the 6-dof pose twist; the Gauss-Newton Hessian H = ΣJᵢᵀJᵢ inverts
to the pose covariance fed to the sensor filter's visual update.

Batched over the frame's full association table — one (N, 6) Jacobian block
and a single 6×6 solve, vs the reference's per-point loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, hat


def estimate_pose_covariance(
    pose: Pose,
    cam: jax.Array,          # (4,) fx fy cx cy (undistorted space)
    kp_xy: jax.Array,        # (N, 2) observed undistorted keypoints
    kp_valid: jax.Array,     # (N,) bool
    assoc: jax.Array,        # (N,) int32 → map point slot or -1
    mp_pos: jax.Array,       # (P, 3)
    mp_valid: jax.Array,     # (P,) bool
) -> tuple[jax.Array, jax.Array]:
    """Returns ((6, 6) f64-ish covariance in [rho, phi] twist order, ok).

    ok is False when the Hessian is not invertible (e.g. <6 usable
    observations), matching the reference's failure return."""
    ok_a = (assoc >= 0) & kp_valid
    safe = jnp.where(ok_a, assoc, 0)
    ok_a = ok_a & mp_valid[safe]
    X = mp_pos[safe]                                     # (N, 3) world
    Xc = pose.transform(X)                               # camera frame
    z = Xc[:, 2]
    ok_a = ok_a & (z > 1e-6)
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)

    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    u = fx * Xc[:, 0] * inv_z + cx
    v = fy * Xc[:, 1] * inv_z + cy
    du = u - kp_xy[:, 0]
    dv = v - kp_xy[:, 1]

    # d(uv)/d(Xc): (N, 2, 3)
    zero = jnp.zeros_like(z)
    J_proj = jnp.stack([
        jnp.stack([fx * inv_z, zero, -fx * Xc[:, 0] * inv_z * inv_z], -1),
        jnp.stack([zero, fy * inv_z, -fy * Xc[:, 1] * inv_z * inv_z], -1),
    ], axis=1)
    # d(Xc)/d(twist [rho, phi]) for the left-perturbation T ← exp(δ)∘T:
    # dXc/drho = I, dXc/dphi = -[Xc]× ;   (N, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3), (z.shape[0], 3, 3))
    J_pose = jnp.concatenate([eye, -hat(Xc)], axis=-1)
    J_uv = jnp.einsum("nij,njk->nik", J_proj, J_pose)    # (N, 2, 6)
    # gradient of the SQUARED pixel error (CalculateJacobian's jNorm·J row)
    J = 2.0 * (du[:, None] * J_uv[:, 0, :] + dv[:, None] * J_uv[:, 1, :])
    J = jnp.where(ok_a[:, None], J, 0.0)

    H = J.T @ J                                          # (6, 6)
    n_obs = jnp.sum(ok_a.astype(jnp.int32))
    # invertibility via the smallest eigenvalue of the symmetric Hessian
    eigs = jnp.linalg.eigvalsh(H)
    ok = (n_obs >= 6) & (eigs[0] > 1e-10) & jnp.isfinite(eigs).all()
    H_safe = jnp.where(ok, H, jnp.eye(6))
    cov = jnp.linalg.inv(H_safe)
    cov = 0.5 * (cov + cov.T)      # f32 inverse is only symmetric to ~1e-9
    return jnp.where(ok, cov, jnp.eye(6) * 1e6), ok
