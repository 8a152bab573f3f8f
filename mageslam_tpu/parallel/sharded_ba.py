"""Multi-chip global bundle adjustment: the Schur system sharded over points.

The global-BA memory/compute giants are the (K, P, 6, 3) camera-point cross
tensor and its (K, K, 6, 6) Schur contraction (ba/schur.py:100-161; ~151 MB
and ~2.4 TFLOP-ish at the driver budgets K=256, P=8192). This module
partitions the POINT axis over the mesh's model axis:

  - every device masks the (replicated, small) observation arrays to its
    point range and scatter-builds only its (K, P/d, 6, 3) cross block,
    its V/g_p slices, and its partial H_cc/g_c — each observation lands on
    exactly one device, so a single psum reconstructs the full camera-side
    blocks (H_cc is 9.4 MB at capacity — ICI-cheap),
  - the Schur contraction S = H_cc − Σ_p Y Wᵀ splits d ways over the point
    axis and meets in the same psum,
  - the dense (6K, 6K) Cholesky is replicated (1.5k×1.5k — trivial),
  - back-substitution is local per point shard; dx_p returns via all_gather.

Equivalent to ba.schur.solve_lm_system (asserted in tests on the virtual
8-device CPU mesh); collectives are psum/all_gather riding ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ba.problem import BAProblem, BAState
from ..ba.residuals import observation_residuals, robust_cost, tether_residuals
from ..ba.schur import LMStepResult, _EPS, _inv3x3
from ..geometry.se3 import retract


def make_sharded_lm_solver(mesh: Mesh, axis: str = "model"):
    """Returns solve(problem, obs, teth, lam) -> (dx_c (K,6), dx_p (P,3)),
    numerically equivalent to ba.schur.solve_lm_system but with the point
    axis of the normal equations partitioned over `axis`."""
    d = mesh.shape[axis]

    def kernel(obs_cam, obs_pt, Jc, Jp, r, w,
               t_c1, t_c2, tJ1, tJ2, t_r, t_w,
               cam_fixed, cam_valid, pt_valid, lam):
        K = cam_fixed.shape[0]
        P_total = pt_valid.shape[0]
        P_local = P_total // d
        shard = jax.lax.axis_index(axis)
        p_lo = shard * P_local

        free_cam = jnp.logical_not(cam_fixed)[obs_cam]
        Jc = Jc * free_cam[:, None, None]
        Jc_w = Jc * w[:, None, None]
        Jp_w = Jp * w[:, None, None]

        # every observation belongs to exactly one device's point range
        local = (obs_pt >= p_lo) & (obs_pt < p_lo + P_local)
        lw = local.astype(jnp.float32)
        lp = jnp.where(local, obs_pt - p_lo, P_local)      # drop scatters

        U_obs = jnp.einsum("oij,oik->ojk", Jc_w, Jc) * lw[:, None, None]
        V_obs = jnp.einsum("oij,oik->ojk", Jp_w, Jp) * lw[:, None, None]
        W_obs = jnp.einsum("oij,oik->ojk", Jc_w, Jp) * lw[:, None, None]
        gc_obs = jnp.einsum("oij,oi->oj", Jc_w, -r) * lw[:, None]
        gp_obs = jnp.einsum("oij,oi->oj", Jp_w, -r) * lw[:, None]

        H_cc = jnp.zeros((K, K, 6, 6), jnp.float32)
        H_cc = H_cc.at[obs_cam, obs_cam].add(U_obs)
        V = jnp.zeros((P_local, 3, 3), jnp.float32).at[lp].add(
            V_obs, mode="drop")
        Wc = jnp.zeros((K, P_local, 6, 3), jnp.float32).at[obs_cam, lp].add(
            W_obs, mode="drop")
        g_c = jnp.zeros((K, 6), jnp.float32).at[obs_cam].add(gc_obs)
        g_p = jnp.zeros((P_local, 3), jnp.float32).at[lp].add(
            gp_obs, mode="drop")

        # tether camera-camera blocks contribute ONCE (shard 0 pre-psum)
        t_on = jnp.where(shard == 0, 1.0, 0.0)
        free1 = jnp.logical_not(cam_fixed)[t_c1]
        free2 = jnp.logical_not(cam_fixed)[t_c2]
        J1 = tJ1 * (free1[:, None, None] * t_on)
        J2 = tJ2 * (free2[:, None, None] * t_on)
        tw = t_w[:, None, None]
        H_cc = H_cc.at[t_c1, t_c1].add(jnp.einsum("tij,tik->tjk", J1 * tw, J1))
        H_cc = H_cc.at[t_c2, t_c2].add(jnp.einsum("tij,tik->tjk", J2 * tw, J2))
        H_cc = H_cc.at[t_c1, t_c2].add(jnp.einsum("tij,tik->tjk", J1 * tw, J2))
        H_cc = H_cc.at[t_c2, t_c1].add(jnp.einsum("tij,tik->tjk", J2 * tw, J1))
        g_c = g_c.at[t_c1].add(jnp.einsum("tij,ti->tj", J1 * tw, -t_r))
        g_c = g_c.at[t_c2].add(jnp.einsum("tij,ti->tj", J2 * tw, -t_r))

        eye3 = jnp.eye(3, dtype=jnp.float32)
        eye6 = jnp.eye(6, dtype=jnp.float32)
        V_inv = _inv3x3(V + lam * eye3[None])               # (P/d, 3, 3)
        Y = jnp.einsum("kpij,pjl->kpil", Wc, V_inv)         # (K, P/d, 6, 3)
        S_part = H_cc - jnp.einsum("kpij,qplj->kqil", Y, Wc)
        b_part = g_c - jnp.einsum("kpij,pj->ki", Y, g_p)

        S = jax.lax.psum(S_part, axis)                      # (K, K, 6, 6)
        b = jax.lax.psum(b_part, axis)                      # (K, 6)

        idx = jnp.arange(K)
        S = S.at[idx, idx].add(lam * eye6[None])
        freeze = jnp.logical_or(cam_fixed, jnp.logical_not(cam_valid))
        keep = jnp.logical_not(freeze).astype(jnp.float32)
        S = S * keep[:, None, None, None] * keep[None, :, None, None]
        S = S.at[idx, idx].add(
            freeze.astype(jnp.float32)[:, None, None] * eye6[None])
        b = b * keep[:, None]

        S_mat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        L = jnp.linalg.cholesky(S_mat)
        dx_c = jax.scipy.linalg.cho_solve((L, True),
                                          b.reshape(K * 6)).reshape(K, 6)
        bad = jnp.any(jnp.isnan(dx_c))
        dx_lu = jnp.linalg.solve(S_mat, b.reshape(K * 6)).reshape(K, 6)
        dx_c = jnp.where(bad, dx_lu, dx_c) * keep[:, None]

        rhs_p = g_p - jnp.einsum("kpij,ki->pj", Wc, dx_c)   # (P/d, 3)
        dx_p_loc = jnp.einsum("pij,pj->pi", V_inv, rhs_p)
        pt_ok = jax.lax.dynamic_slice_in_dim(
            pt_valid.astype(jnp.float32), p_lo, P_local)
        dx_p_loc = dx_p_loc * pt_ok[:, None]
        dx_p = jax.lax.all_gather(dx_p_loc, axis).reshape(P_total, 3)
        return dx_c, dx_p

    mapped = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(),) * 16,
        out_specs=(P(), P()),
        check_vma=False,      # psum/all_gather outputs are replicated
    )

    def solve(problem: BAProblem, obs, teth, lam):
        pf = jnp.asarray(problem.points_fixed)
        Jp = obs.Jp * jnp.where(pf, 0.0, 1.0)
        return mapped(
            problem.obs_cam, problem.obs_pt, obs.Jc, Jp, obs.r, obs.w,
            problem.tether_cam1, problem.tether_cam2,
            teth.Jc1, teth.Jc2, teth.r, teth.w,
            problem.cam_fixed, problem.cam_valid, problem.pt_valid,
            jnp.asarray(lam, jnp.float32),
        )

    return solve


def make_sharded_lm_iteration(mesh: Mesh, axis: str = "model"):
    """g2o-style LM iteration (ba.schur.lm_iteration semantics) with the
    linear solve sharded over the mesh. Jit once; call per step."""
    solve = make_sharded_lm_solver(mesh, axis)

    def iteration(problem: BAProblem, state: BAState,
                  huber_width: jax.Array) -> LMStepResult:
        obs = observation_residuals(problem, state.poses, state.points,
                                    state.obs_info, huber_width)
        teth = tether_residuals(problem, state.poses)

        # λ init mirrors lm_iteration exactly: user value, else 1e-5 · max
        # |diagonal| of the assembled H blocks (scatter-added per entity)
        free_cam = jnp.logical_not(problem.cam_fixed)[problem.obs_cam]
        Jc_f = obs.Jc * free_cam[:, None, None]
        Jp_f = obs.Jp * jnp.where(jnp.asarray(problem.points_fixed), 0.0, 1.0)
        w3 = obs.w[:, None]
        diag_c = jnp.zeros((problem.num_cameras, 6), jnp.float32).at[
            problem.obs_cam].add(w3 * jnp.einsum("oij,oij->oj", Jc_f, Jc_f))
        diag_p = jnp.zeros((problem.num_points, 3), jnp.float32).at[
            problem.obs_pt].add(w3 * jnp.einsum("oij,oij->oj", Jp_f, Jp_f))
        max_diag = jnp.maximum(jnp.max(jnp.abs(diag_c)),
                               jnp.max(jnp.abs(diag_p)))
        lam = jnp.where(state.lam > 0, state.lam,
                        1e-5 * jnp.maximum(max_diag, _EPS))

        cost0 = robust_cost(obs.chi2, huber_width, obs.w) + jnp.sum(teth.chi2)
        dx_c, dx_p = solve(problem, obs, teth, lam)
        poses_new = retract(state.poses, dx_c)
        points_new = state.points + dx_p
        obs_new = observation_residuals(problem, poses_new, points_new,
                                        state.obs_info, huber_width)
        teth_new = tether_residuals(problem, poses_new)
        cost_new = (robust_cost(obs_new.chi2, huber_width, obs_new.w)
                    + jnp.sum(teth_new.chi2))

        # gain-ratio scale: same full gradient the dense path assembles
        # (eq.g_c incl. tether terms, eq.g_p)
        g_c = jnp.einsum("oij,oi->oj", Jc_f * obs.w[:, None, None], -obs.r)
        gc_full = jnp.zeros_like(dx_c).at[problem.obs_cam].add(g_c)
        free1 = jnp.logical_not(problem.cam_fixed)[problem.tether_cam1]
        free2 = jnp.logical_not(problem.cam_fixed)[problem.tether_cam2]
        J1 = teth.Jc1 * free1[:, None, None] * teth.w[:, None, None]
        J2 = teth.Jc2 * free2[:, None, None] * teth.w[:, None, None]
        gc_full = gc_full.at[problem.tether_cam1].add(
            jnp.einsum("tij,ti->tj", J1, -teth.r))
        gc_full = gc_full.at[problem.tether_cam2].add(
            jnp.einsum("tij,ti->tj", J2, -teth.r))
        g_p = jnp.einsum("oij,oi->oj", Jp_f * obs.w[:, None, None], -obs.r)
        gp_full = jnp.zeros_like(dx_p).at[problem.obs_pt].add(g_p)
        scale = (jnp.sum(dx_c * (lam * dx_c + gc_full))
                 + jnp.sum(dx_p * (lam * dx_p + gp_full)) + _EPS)
        rho = (cost0 - cost_new) / scale
        ok = jnp.logical_and(jnp.isfinite(cost_new), rho > 0)

        lam_acc = lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3)
        poses_out = jax.tree.map(lambda a, b: jnp.where(ok, a, b),
                                 poses_new, state.poses)
        points_out = jnp.where(ok, points_new, state.points)
        new_state = BAState(
            poses=poses_out, points=points_out,
            lam=jnp.where(ok, lam_acc, lam * state.ni),
            ni=jnp.where(ok, 2.0, state.ni * 2.0),
            obs_info=state.obs_info,
        )
        return LMStepResult(state=new_state,
                            cost=jnp.where(ok, cost_new, cost0), accepted=ok)

    return jax.jit(iteration)


def make_sharded_step_bundle_adjust(mesh: Mesh, axis: str = "model"):
    """step_bundle_adjust (ba/step.py:29-56) with the LM linear solve
    point-sharded over the mesh — a drop-in `step_fn` for
    iterate_bundle_adjust, so the session's global BA (loop-closure close
    and fossilize) rides the multi-chip solver when a mesh exists
    (SlamSession.enable_sharded_global_ba). Identical semantics: one LM
    iteration per Huber-width entry, then outlier extraction on unweighted
    squared pixel error / behind-camera depth."""
    iteration = make_sharded_lm_iteration(mesh, axis)

    @jax.jit
    def step(problem: BAProblem, state: BAState, huber_widths, max_error_square):
        def body(st, hw):
            res = iteration(problem, st, hw)
            return res.state, res.cost

        state, _ = jax.lax.scan(body, state, huber_widths)
        obs = observation_residuals(problem, state.poses, state.points,
                                    state.obs_info, jnp.float32(0.0))
        sum_sq = jnp.sum(obs.r * obs.r, axis=-1)
        active = state.obs_info > 0
        is_outlier = active & ((obs.depth <= 0.0) | (sum_sq > max_error_square))
        survivors = active & jnp.logical_not(is_outlier)
        mse = jnp.sum(jnp.where(survivors, sum_sq, 0.0)) / jnp.maximum(
            jnp.sum(survivors.astype(jnp.float32)), 1.0)
        new_state = state._replace(
            obs_info=jnp.where(is_outlier, 0.0, state.obs_info))
        return new_state, mse, is_outlier

    return step
