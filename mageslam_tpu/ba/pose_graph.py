"""Sim(3) pose-graph optimization.

Replaces BundlerLib's PoseGraphOptimizer (Include/PoseGraphOptimizer.h:18-65:
Sim3 vertices + relative-Sim3 edges over g2o — declared by the reference but
never exercised by Core, which closes loops with full global BA instead;
provided here for the same API surface and for loop-graph workloads where a
pose graph beats a global BA).

Batched LM over all keyframe Sim3s at once: each vertex is (s, R, t) with a
7-dim tangent [ρ(3), φ(3), σ(1)]; each edge's residual is the 7-dim log of
the relative-transform error; Jacobians come from jax.jacfwd over the edge's
two tangents (E edges × two 7×7 blocks), normal equations assemble by
scatter-add into a dense (7K, 7K) system — the same shape as ba.schur without
the point elimination.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, exp_so3, log_so3

_EPS = 1e-12


class Sim3(NamedTuple):
    """s · R x + t (world→keyframe), batched."""

    s: jax.Array   # (...,)
    R: jax.Array   # (..., 3, 3)
    t: jax.Array   # (..., 3)

    @staticmethod
    def from_pose(pose: Pose, s: jax.Array | float = 1.0) -> "Sim3":
        return Sim3(jnp.broadcast_to(jnp.asarray(s, jnp.float32),
                                     pose.t.shape[:-1]), pose.R, pose.t)

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            self.s * other.s,
            jnp.einsum("...ij,...jk->...ik", self.R, other.R),
            self.s[..., None] * jnp.einsum("...ij,...j->...i", self.R, other.t)
            + self.t,
        )

    def inverse(self) -> "Sim3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        inv_s = 1.0 / jnp.maximum(self.s, _EPS)
        return Sim3(inv_s, Rt,
                    -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, self.t))


def sim3_exp(xi: jax.Array) -> Sim3:
    """Tangent [ρ(3), φ(3), σ] → Sim3 (first-order-coupled form: exact in R
    and s, V approximated by the SE(3) left Jacobian — adequate for the small
    LM updates this optimizer takes)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    from ..geometry.se3 import _so3_left_jacobian

    R = exp_so3(phi)
    t = jnp.einsum("...ij,...j->...i", _so3_left_jacobian(phi), rho)
    return Sim3(jnp.exp(sigma), R, t)


def sim3_log(g: Sim3) -> jax.Array:
    from ..geometry.se3 import _so3_left_jacobian

    phi = log_so3(g.R)
    Jl = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(Jl, g.t[..., None])[..., 0]
    sigma = jnp.log(jnp.maximum(g.s, _EPS))
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def _edge_residual(xi_i, xi_j, gi: Sim3, gj: Sim3, meas: Sim3) -> jax.Array:
    """r = log( meas⁻¹ · (exp(ξj)·gj) · (exp(ξi)·gi)⁻¹ ) — measurement is the
    relative transform i→j (g2o EdgeSim3 convention)."""
    Gi = sim3_exp(xi_i).compose(gi)
    Gj = sim3_exp(xi_j).compose(gj)
    err = meas.inverse().compose(Gj.compose(Gi.inverse()))
    return sim3_log(err)


class PoseGraphProblem(NamedTuple):
    vertices: Sim3          # (K,)
    fixed: jax.Array        # (K,) bool
    valid: jax.Array        # (K,) bool
    edge_i: jax.Array       # (E,) int32
    edge_j: jax.Array       # (E,) int32
    edge_meas: Sim3         # (E,) relative i→j measurements
    edge_weight: jax.Array  # (E,) f32 (0 = invalid)


@partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(problem: PoseGraphProblem,
                        iterations: int = 10) -> Sim3:
    """Batched LM over the whole graph. Returns the optimized vertices."""
    K = problem.fixed.shape[0]
    E = problem.edge_i.shape[0]
    zero7 = jnp.zeros((E, 7))

    def residuals_and_jac(verts: Sim3):
        gi = jax.tree.map(lambda a: a[problem.edge_i], verts)
        gj = jax.tree.map(lambda a: a[problem.edge_j], verts)
        r = jax.vmap(_edge_residual)(zero7, zero7, gi, gj, problem.edge_meas)
        Ji = jax.vmap(jax.jacfwd(_edge_residual, argnums=0))(
            zero7, zero7, gi, gj, problem.edge_meas)
        Jj = jax.vmap(jax.jacfwd(_edge_residual, argnums=1))(
            zero7, zero7, gi, gj, problem.edge_meas)
        return r, Ji, Jj

    def cost_of(verts: Sim3):
        gi = jax.tree.map(lambda a: a[problem.edge_i], verts)
        gj = jax.tree.map(lambda a: a[problem.edge_j], verts)
        r = jax.vmap(_edge_residual)(zero7, zero7, gi, gj, problem.edge_meas)
        return jnp.sum(problem.edge_weight * jnp.sum(r * r, axis=-1))

    freeze = problem.fixed | jnp.logical_not(problem.valid)

    def build(verts: Sim3):
        r, Ji, Jj = residuals_and_jac(verts)
        keep_i = jnp.logical_not(freeze)[problem.edge_i].astype(jnp.float32)
        keep_j = jnp.logical_not(freeze)[problem.edge_j].astype(jnp.float32)
        Ji = Ji * keep_i[:, None, None]
        Jj = Jj * keep_j[:, None, None]
        w = problem.edge_weight[:, None, None]
        H = jnp.zeros((K, K, 7, 7))
        H = H.at[problem.edge_i, problem.edge_i].add(
            jnp.einsum("eij,eik->ejk", Ji * w, Ji))
        H = H.at[problem.edge_j, problem.edge_j].add(
            jnp.einsum("eij,eik->ejk", Jj * w, Jj))
        H = H.at[problem.edge_i, problem.edge_j].add(
            jnp.einsum("eij,eik->ejk", Ji * w, Jj))
        H = H.at[problem.edge_j, problem.edge_i].add(
            jnp.einsum("eij,eik->ejk", Jj * w, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[problem.edge_i].add(jnp.einsum("eij,ei->ej", Ji * w, -r))
        b = b.at[problem.edge_j].add(jnp.einsum("eij,ei->ej", Jj * w, -r))
        return H, b

    def solve(H, b, lam):
        idx = jnp.arange(K)
        H = H.at[idx, idx].add(lam * jnp.eye(7)[None])
        keep = jnp.logical_not(freeze).astype(jnp.float32)
        H = H * keep[:, None, None, None] * keep[None, :, None, None]
        H = H.at[idx, idx].add(freeze.astype(jnp.float32)[:, None, None]
                               * jnp.eye(7)[None])
        b = b * keep[:, None]
        dx = jnp.linalg.solve(
            H.transpose(0, 2, 1, 3).reshape(K * 7, K * 7), b.reshape(K * 7)
        ).reshape(K, 7)
        return dx * keep[:, None]

    def apply(verts: Sim3, dx):
        upd = sim3_exp(dx)
        return upd.compose(verts)

    def step(carry, _):
        verts, lam, ni, cost = carry
        H, b = build(verts)
        dx = solve(H, b, lam)
        verts_new = apply(verts, dx)
        cost_new = cost_of(verts_new)
        scale = jnp.sum(dx * (lam * dx + b)) + _EPS
        rho = (cost - cost_new) / scale
        ok = jnp.isfinite(cost_new) & (rho > 0)
        pick = lambda a, c: jax.tree.map(
            lambda x, y: jnp.where(jnp.reshape(ok, (1,) * x.ndim), x, y), a, c)
        return (pick(verts_new, verts),
                jnp.where(ok, lam * jnp.maximum(1 / 3, 1 - (2 * rho - 1) ** 3),
                          lam * ni),
                jnp.where(ok, 2.0, ni * 2.0),
                jnp.where(ok, cost_new, cost)), None

    H0, _ = build(problem.vertices)
    lam0 = 1e-5 * jnp.maximum(jnp.max(jnp.abs(
        jnp.diagonal(H0[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1))), _EPS)
    (verts, _, _, _), _ = jax.lax.scan(
        step, (problem.vertices, lam0, jnp.float32(2.0),
               cost_of(problem.vertices)), None, length=iterations)
    return verts
