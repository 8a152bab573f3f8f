"""Full bundle adjustment: Schur-complement reduced camera system, batched.

Replaces g2o's BlockSolver_6_3 + LinearSolverDense pipeline as driven by
BundlerLib::StepBundleAdjustment (Dependencies/BundlerLib/Source/BundlerLib.cpp:
364-446). One LM iteration is:

  1. batched residuals/Jacobians for every observation + tether,
  2. normal-equation blocks via scatter-add:
       U  (K,6,6) camera diagonals          V (P,3,3) point diagonals
       Wc (K,P,6,3) camera-point cross      g_c (K,6), g_p (P,3)
       tether blocks scattered into the camera-camera matrix H_cc,
  3. point elimination: V̂ = V + λI (3×3 closed-form inverse),
     S = H_cc + λI - Wc V̂⁻¹ Wcᵀ  (one einsum — MXU work),
  4. dense Cholesky on the (6K, 6K) reduced system,
  5. back-substitution dx_p = V̂⁻¹(g_p - Wcᵀ dx_c),
  6. g2o gain-ratio accept/reject with λ/ν update.

Fixed cameras (BundlerLib::FixCameraPose) get zeroed Jacobians and an identity
diagonal block, so their update is exactly zero. Invalid slots carry zero
weights throughout. The dense (K,P,6,3) cross tensor is the TPU-native choice:
for the local-BA budget (K≤32, P≤2048) it is ~4.7 MB and the Schur einsum is
a single large contraction instead of g2o's per-block pointer chasing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, retract
from .problem import BAProblem, BAState
from .residuals import (
    ObsResiduals,
    TetherResiduals,
    observation_residuals,
    robust_cost,
    tether_residuals,
)

_EPS = 1e-12


def _inv3x3(M: jax.Array) -> jax.Array:
    """Closed-form batched 3×3 inverse (adjugate / det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < _EPS, _EPS, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


class NormalEquations(NamedTuple):
    H_cc: jax.Array   # (K, K, 6, 6) camera-camera blocks (diag U + tether cross)
    V: jax.Array      # (P, 3, 3) point diagonal blocks
    Wc: jax.Array     # (K, P, 6, 3) camera-point cross blocks
    g_c: jax.Array    # (K, 6)
    g_p: jax.Array    # (P, 3)


def build_normal_equations(
    problem: BAProblem, obs: ObsResiduals, teth: TetherResiduals
) -> NormalEquations:
    K = problem.num_cameras
    P = problem.num_points

    # zero camera Jacobians of fixed cameras; zero point Jacobians if ArePointsFixed
    # (branchless: with Jp ≡ 0, V=W=g_p=0 and the Schur step reduces to a pure
    # camera solve with dx_p = 0 — no control flow needed under jit)
    free_cam = jnp.logical_not(problem.cam_fixed)[problem.obs_cam]  # (O,)
    Jc = obs.Jc * free_cam[:, None, None]
    pf = jnp.asarray(problem.points_fixed)
    Jp = obs.Jp * jnp.where(pf, 0.0, 1.0)

    # per-observation blocks, then scatter-add into the banks
    Jc_w = Jc * obs.w[:, None, None]
    Jp_w = Jp * obs.w[:, None, None]
    U_obs = jnp.einsum("oij,oik->ojk", Jc_w, Jc)
    V_obs = jnp.einsum("oij,oik->ojk", Jp_w, Jp)
    W_obs = jnp.einsum("oij,oik->ojk", Jc_w, Jp)          # (O, 6, 3)
    gc_obs = jnp.einsum("oij,oi->oj", Jc_w, -obs.r)       # b = -Jᵀ Ω e (g2o sign)
    gp_obs = jnp.einsum("oij,oi->oj", Jp_w, -obs.r)

    H_cc = jnp.zeros((K, K, 6, 6), jnp.float32)
    H_cc = H_cc.at[problem.obs_cam, problem.obs_cam].add(U_obs)
    V = jnp.zeros((P, 3, 3), jnp.float32).at[problem.obs_pt].add(V_obs)
    Wc = jnp.zeros((K, P, 6, 3), jnp.float32).at[problem.obs_cam, problem.obs_pt].add(W_obs)
    g_c = jnp.zeros((K, 6), jnp.float32).at[problem.obs_cam].add(gc_obs)
    g_p = jnp.zeros((P, 3), jnp.float32).at[problem.obs_pt].add(gp_obs)

    # tether contributions (camera-camera only)
    if problem.tether_cam1.shape[0] > 0:
        free1 = jnp.logical_not(problem.cam_fixed)[problem.tether_cam1]
        free2 = jnp.logical_not(problem.cam_fixed)[problem.tether_cam2]
        J1 = teth.Jc1 * free1[:, None, None]
        J2 = teth.Jc2 * free2[:, None, None]
        w = teth.w[:, None, None]
        c1, c2 = problem.tether_cam1, problem.tether_cam2
        H_cc = H_cc.at[c1, c1].add(jnp.einsum("tij,tik->tjk", J1 * w, J1))
        H_cc = H_cc.at[c2, c2].add(jnp.einsum("tij,tik->tjk", J2 * w, J2))
        H_cc = H_cc.at[c1, c2].add(jnp.einsum("tij,tik->tjk", J1 * w, J2))
        H_cc = H_cc.at[c2, c1].add(jnp.einsum("tij,tik->tjk", J2 * w, J1))
        g_c = g_c.at[c1].add(jnp.einsum("tij,ti->tj", J1 * w, -teth.r))
        g_c = g_c.at[c2].add(jnp.einsum("tij,ti->tj", J2 * w, -teth.r))

    return NormalEquations(H_cc=H_cc, V=V, Wc=Wc, g_c=g_c, g_p=g_p)


def solve_lm_system(
    problem: BAProblem, eq: NormalEquations, lam: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Solve the damped system via Schur complement. Returns (dx_c (K,6), dx_p (P,3))."""
    K = problem.num_cameras
    P = problem.num_points
    eye6 = jnp.eye(6, dtype=jnp.float32)
    eye3 = jnp.eye(3, dtype=jnp.float32)

    V_hat = eq.V + lam * eye3[None]
    V_inv = _inv3x3(V_hat)                                       # (P, 3, 3)

    Y = jnp.einsum("kpij,pjl->kpil", eq.Wc, V_inv)               # (K, P, 6, 3)
    S = eq.H_cc - jnp.einsum("kpij,qplj->kqil", Y, eq.Wc)        # (K, K, 6, 6)
    b = eq.g_c - jnp.einsum("kpij,pj->ki", Y, eq.g_p)            # (K, 6)

    # damping on the camera diagonal
    idx = jnp.arange(K)
    S = S.at[idx, idx].add(lam * eye6[None])

    # fixed/invalid cameras: identity row/col so dx = 0 exactly
    freeze = jnp.logical_or(problem.cam_fixed, jnp.logical_not(problem.cam_valid))
    keep = jnp.logical_not(freeze).astype(jnp.float32)
    S = S * keep[:, None, None, None] * keep[None, :, None, None]
    S = S.at[idx, idx].add(freeze.astype(jnp.float32)[:, None, None] * eye6[None])
    b = b * keep[:, None]

    S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
    L = jnp.linalg.cholesky(S_mat)
    dx_c = jax.scipy.linalg.cho_solve((L, True), b.reshape(K * 6)).reshape(K, 6)
    # Cholesky fails (NaNs) if S isn't PD — fall back to LU solve in that
    # case. Behind lax.cond so the common (PD) path never pays for the LU:
    # an unconditional fallback solve measurably doubled the per-LM-step
    # latency of the mapping core on the real chip.
    bad = jnp.any(jnp.isnan(dx_c))
    dx_c = jax.lax.cond(
        bad,
        lambda: jnp.linalg.solve(S_mat, b.reshape(K * 6)).reshape(K, 6),
        lambda: dx_c,
    )
    dx_c = dx_c * keep[:, None]

    rhs_p = eq.g_p - jnp.einsum("kpij,ki->pj", eq.Wc, dx_c)      # (P, 3)
    dx_p = jnp.einsum("pij,pj->pi", V_inv, rhs_p)
    dx_p = dx_p * problem.pt_valid.astype(jnp.float32)[:, None]
    return dx_c, dx_p


class LMStepResult(NamedTuple):
    state: BAState
    cost: jax.Array       # robust cost after the step (accepted value)
    accepted: jax.Array   # bool


def _cost(problem: BAProblem, poses: Pose, points: jax.Array,
          obs_info: jax.Array, huber_width: jax.Array) -> jax.Array:
    obs = observation_residuals(problem, poses, points, obs_info, huber_width)
    teth = tether_residuals(problem, poses)
    return robust_cost(obs.chi2, huber_width, obs.w) + jnp.sum(teth.chi2)


def lm_iteration(problem: BAProblem, state: BAState, huber_width: jax.Array) -> LMStepResult:
    """One g2o-style LM iteration (≈ one `Optimizer->Step()`)."""
    obs = observation_residuals(problem, state.poses, state.points, state.obs_info,
                                huber_width)
    teth = tether_residuals(problem, state.poses)
    eq = build_normal_equations(problem, obs, teth)

    # λ init: user value if set, else g2o's 1e-5 · max diag of H
    max_diag = jnp.maximum(
        jnp.max(jnp.abs(jnp.diagonal(eq.H_cc[jnp.arange(problem.num_cameras),
                                             jnp.arange(problem.num_cameras)],
                                     axis1=-2, axis2=-1))),
        jnp.max(jnp.abs(jnp.diagonal(eq.V, axis1=-2, axis2=-1))),
    )
    lam = jnp.where(state.lam > 0, state.lam, 1e-5 * jnp.maximum(max_diag, _EPS))

    cost0 = robust_cost(obs.chi2, huber_width, obs.w) + jnp.sum(teth.chi2)

    dx_c, dx_p = solve_lm_system(problem, eq, lam)
    poses_new = retract(state.poses, dx_c)
    points_new = state.points + dx_p
    cost_new = _cost(problem, poses_new, points_new, state.obs_info, huber_width)

    scale = (
        jnp.sum(dx_c * (lam * dx_c + eq.g_c))
        + jnp.sum(dx_p * (lam * dx_p + eq.g_p))
        + _EPS
    )
    rho = (cost0 - cost_new) / scale
    ok = jnp.logical_and(jnp.isfinite(cost_new), rho > 0)

    lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
    poses_out = jax.tree.map(lambda a, b: jnp.where(ok, a, b), poses_new, state.poses)
    points_out = jnp.where(ok, points_new, state.points)
    new_state = BAState(
        poses=poses_out,
        points=points_out,
        lam=jnp.where(ok, lam_acc, lam * state.ni),
        ni=jnp.where(ok, 2.0, state.ni * 2.0),
        obs_info=state.obs_info,
    )
    return LMStepResult(state=new_state, cost=jnp.where(ok, cost_new, cost0), accepted=ok)
