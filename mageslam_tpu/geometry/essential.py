"""Batched 5-point essential matrix estimation, TPU-native.

Replaces Tracking/ComputeEssential.{h,cpp} (`mira::FindEssentialMat`, a
modified OpenCV Nistér solver) with a formulation that maps to TPU:

  1. For each 5-point sample, the epipolar constraints give a 5×9 system;
     its 4-dim null space (batched SVD) spans E = x·E1 + y·E2 + z·E3 + E4.
  2. The 10 cubic constraints (det E = 0 and 2·E·Eᵀ·E − tr(E·Eᵀ)·E = 0) are
     polynomials of total degree 3 in (x, y, z). Their 20 monomial
     coefficients are extracted *numerically* by evaluating each constraint at
     20 fixed sample points and applying a precomputed inverse Vandermonde —
     no symbolic expansion (the part of Nistér that is hundreds of terms in
     OpenCV's five-point.cpp).
  3. Hidden-variable resultant: grouping by the 10 (x, y) monomials gives a
     10×10 matrix M(z) whose entries are cubics in z; real roots of
     det M(z) = 0 are found by sign changes on a tan-warped grid plus fixed
     bisection — TPU has no nonsymmetric eigensolver, and only real roots
     matter. Spurious roots yield low-scoring hypotheses and die in RANSAC.
  4. At each root, the null vector of M(z*) (one more batched SVD) gives
     (x, y) and hence E.

Everything is fixed-shape and batched over RANSAC hypotheses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .se3 import Pose

MAX_ROOTS = 10
GRID_SIZE = 256

# ---------------------------------------------------------------------------
# monomial bookkeeping: total-degree-3 monomials in (x, y, z)
# ---------------------------------------------------------------------------
_MONOMIALS = [
    (i, j, k) for i in range(4) for j in range(4) for k in range(4) if i + j + k <= 3
]
assert len(_MONOMIALS) == 20
# (x, y) monomials of degree ≤ 3 (the hidden-variable grouping)
_XY_MONOMIALS = [(i, j) for i in range(4) for j in range(4) if i + j <= 3]
assert len(_XY_MONOMIALS) == 10

# map: full monomial index → (xy monomial index, z power)
_XY_INDEX = {m: n for n, m in enumerate(_XY_MONOMIALS)}
_MONO_TO_XY = np.array([_XY_INDEX[(i, j)] for (i, j, _) in _MONOMIALS], np.int32)
_MONO_ZPOW = np.array([k for (_, _, k) in _MONOMIALS], np.int32)


def _make_vandermonde_inverse() -> np.ndarray:
    """20 fixed evaluation points (x, y, z) and the inverse of the 20×20
    monomial Vandermonde, so coeffs = V⁻¹ @ values."""
    rng = np.random.RandomState(7)
    while True:
        pts = rng.uniform(-1.0, 1.0, (20, 3))
        V = np.stack(
            [
                np.prod(pts ** np.array(m, float), axis=1)
                for m in _MONOMIALS
            ],
            axis=1,
        )  # (20 points, 20 monomials)
        if np.linalg.cond(V) < 1e6:
            return pts, np.linalg.inv(V)


_EVAL_POINTS, _V_INV = _make_vandermonde_inverse()


def _essential_constraints(E: jax.Array) -> jax.Array:
    """The 10 cubic constraint values for essential matrix candidates E
    (..., 3, 3): [det E, vec(2 E Eᵀ E − tr(E Eᵀ) E)]."""
    det = jnp.linalg.det(E)
    EEt = jnp.einsum("...ij,...kj->...ik", E, E)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    C = 2.0 * jnp.einsum("...ij,...jk->...ik", EEt, E) - tr[..., None, None] * E
    return jnp.concatenate([det[..., None], C.reshape(*C.shape[:-2], 9)], axis=-1)


def _null_space_4(pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """(B, 5, 2) normalized point pairs → (B, 4, 3, 3) null-space basis of the
    epipolar constraint p2ᵀ E p1 = 0."""
    x1, y1 = pts1[..., 0], pts1[..., 1]
    x2, y2 = pts2[..., 0], pts2[..., 1]
    one = jnp.ones_like(x1)
    # row = kron([x2, y2, 1], [x1, y1, 1]) : E flattened row-major
    Q = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )  # (B, 5, 9)
    _, _, Vt = jnp.linalg.svd(Q, full_matrices=True)
    basis = Vt[..., 5:, :]                       # (B, 4, 9) — smallest 4
    return basis.reshape(*basis.shape[:-1], 3, 3)


def _constraint_coefficients(basis: jax.Array) -> jax.Array:
    """(B, 4, 3, 3) basis → (B, 10 constraints, 20 monomial coeffs)."""
    pts = jnp.asarray(_EVAL_POINTS, jnp.float32)     # (20, 3)
    # E at each sample point: x E1 + y E2 + z E3 + E4
    w = jnp.concatenate([pts, jnp.ones((20, 1), jnp.float32)], axis=1)  # (20, 4)
    E_samples = jnp.einsum("sk,bkij->bsij", w, basis)                   # (B, 20, 3, 3)
    vals = _essential_constraints(E_samples)                            # (B, 20, 10)
    Vinv = jnp.asarray(_V_INV, jnp.float32)
    coeffs = jnp.einsum("ms,bsc->bcm", Vinv, vals)                      # (B, 10, 20)
    return coeffs


def _m_of_z(coeffs: jax.Array, zp: jax.Array) -> jax.Array:
    """Assemble M(z) from precomputed z powers.
    coeffs (B, 10, 20); zp (B, Z, 20) → M (B, Z, 10, 10)."""
    weighted = coeffs[:, None, :, :] * zp[:, :, None, :]                # (B, Z, C, 20)
    group = jnp.asarray(_MONO_TO_XY, jnp.int32)
    M = jnp.zeros(weighted.shape[:-1] + (10,), weighted.dtype)
    return M.at[..., group].add(weighted)


def _zpow(z: jax.Array) -> jax.Array:
    """(..., ) → (..., 20) powers of z per full monomial."""
    return z[..., None] ** jnp.asarray(_MONO_ZPOW, jnp.float32)


def _find_real_roots(coeffs: jax.Array, bisect_iters: int = 40) -> tuple[jax.Array, jax.Array]:
    """Real roots of det M(z) over z ∈ ℝ via tan-warped grid + bisection.
    Returns (roots (B, MAX_ROOTS), valid (B, MAX_ROOTS))."""
    B = coeffs.shape[0]
    u = jnp.linspace(-jnp.pi / 2 + 1e-3, jnp.pi / 2 - 1e-3, GRID_SIZE)
    grid = jnp.tan(u)                                                   # (Z,)
    vals = _det_m_multi(coeffs, jnp.broadcast_to(grid, (B, GRID_SIZE)))  # (B, Z)
    sign = jnp.sign(vals)
    flip = (sign[:, :-1] * sign[:, 1:]) < 0                             # (B, Z-1)

    # take the first MAX_ROOTS sign changes per batch row
    idx = jnp.argsort(jnp.where(flip, jnp.arange(GRID_SIZE - 1)[None, :], GRID_SIZE), axis=1)
    take = idx[:, :MAX_ROOTS]                                           # (B, R)
    valid = jnp.take_along_axis(flip, take, axis=1)
    lo = grid[take]
    hi = grid[take + 1]

    # vectorized bisection: evaluate det at midpoints each iteration
    # (fori_loop keeps the compiled graph small — 40 unrolled 10×10-det
    # evaluations made XLA compile times explode)
    f_lo0 = _det_m_multi(coeffs, lo)

    def body(_, carry):
        lo, hi, f_lo = carry
        mid = 0.5 * (lo + hi)
        f_mid = _det_m_multi(coeffs, mid)
        left = (jnp.sign(f_lo) * jnp.sign(f_mid)) <= 0
        return (
            jnp.where(left, lo, mid),
            jnp.where(left, mid, hi),
            jnp.where(left, f_lo, f_mid),
        )

    lo, hi, _ = jax.lax.fori_loop(0, bisect_iters, body, (lo, hi, f_lo0))
    roots = 0.5 * (lo + hi)
    return roots, valid


def _det_m_multi(coeffs: jax.Array, z: jax.Array) -> jax.Array:
    """det M(z) where z is (B, R) — per-batch evaluation points, with row
    normalization for numeric range control."""
    M = _m_of_z(coeffs, _zpow(z))
    scale = jnp.max(jnp.abs(M), axis=-1, keepdims=True) + 1e-20
    return jnp.linalg.det(M / scale)


def five_point_essential(pts1n: jax.Array, pts2n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Batched Nistér-style 5-point solver on *normalized* coordinates.

    pts1n, pts2n: (B, 5, 2). Returns (E (B, MAX_ROOTS, 3, 3), valid
    (B, MAX_ROOTS)) with ‖E‖_F = 1 per candidate. Frame convention matches the
    reference: p2ᵀ E p1 = 0 with E mapping frame-1 rays to frame-2 epipolar
    lines (ComputeEssential.h:9-12 FindEssentialMat(points1, points2, ...)).
    """
    B = pts1n.shape[0]
    basis = _null_space_4(pts1n, pts2n)                                 # (B, 4, 3, 3)
    coeffs = _constraint_coefficients(basis)                            # (B, 10, 20)
    roots, valid = _find_real_roots(coeffs)                             # (B, R)

    # null vector of M(z*) per root → (x, y)
    M = _m_of_z(coeffs, _zpow(roots))
    scale = jnp.max(jnp.abs(M), axis=-1, keepdims=True) + 1e-20
    _, _, Vt = jnp.linalg.svd(M / scale)
    null = Vt[..., -1, :]                                               # (B, R, 10)
    # xy-monomial layout: index of x is (1,0), y is (0,1), 1 is (0,0)
    ix = _XY_INDEX[(1, 0)]
    iy = _XY_INDEX[(0, 1)]
    i1 = _XY_INDEX[(0, 0)]
    w0 = null[..., i1]
    x = null[..., ix] / jnp.where(jnp.abs(w0) < 1e-12, 1e-12, w0)
    y = null[..., iy] / jnp.where(jnp.abs(w0) < 1e-12, 1e-12, w0)

    wvec = jnp.stack([x, y, roots, jnp.ones_like(roots)], axis=-1)      # (B, R, 4)
    E = jnp.einsum("brk,bkij->brij", wvec, basis)
    E = E / (jnp.linalg.norm(E.reshape(B, MAX_ROOTS, 9), axis=-1)[..., None, None] + 1e-20)
    return E, valid


def decompose_essential(E: jax.Array) -> Pose:
    """E (..., 3, 3) → 4 candidate relative poses (..., 4) as world→camera2
    transforms assuming camera1 = identity (Nistér section 3.1; the
    reference's FindEssentialPotientialPoses)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    Ra = jnp.einsum("...ij,jk,...kl->...il", U, W, Vt)
    Rb = jnp.einsum("...ij,kj,...kl->...il", U, W, Vt)   # W transpose
    t = U[..., :, 2]                                     # (..., 3)
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)            # (..., 4, 3, 3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)              # (..., 4, 3)
    return Pose(R4, t4)


def triangulate_midpoint_pair(pose2: Pose, p1n: jax.Array, p2n: jax.Array) -> jax.Array:
    """Fast midpoint triangulation of normalized rays for cheirality voting.
    Camera1 at identity; pose2 is world→camera2. p1n/p2n (..., 2)."""
    d1 = jnp.concatenate([p1n, jnp.ones_like(p1n[..., :1])], axis=-1)
    d2c = jnp.concatenate([p2n, jnp.ones_like(p2n[..., :1])], axis=-1)
    R2t = jnp.swapaxes(pose2.R, -1, -2)
    d2 = jnp.einsum("...ij,...j->...i", R2t, d2c)
    c2 = -jnp.einsum("...ij,...j->...i", R2t, pose2.t)
    # solve min ‖a d1 - (c2 + b d2)‖: 2x2 normal equations
    d11 = jnp.sum(d1 * d1, axis=-1)
    d12 = jnp.sum(d1 * d2, axis=-1)
    d22 = jnp.sum(d2 * d2, axis=-1)
    r1 = jnp.sum(c2 * d1, axis=-1)
    r2 = jnp.sum(c2 * d2, axis=-1)
    det = d11 * d22 - d12 * d12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    a = (d22 * r1 - d12 * r2) / det
    b = (d12 * r1 - d11 * r2) / det
    return 0.5 * (a[..., None] * d1 + c2 + b[..., None] * d2)
