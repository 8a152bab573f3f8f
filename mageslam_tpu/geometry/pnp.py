"""Batched DLT PnP + RANSAC — the cv::solvePnPRansac replacement.

The reference relocalizes with OpenCV's SOLVEPNP_ITERATIVE inside RANSAC
(PoseEstimator::PNPRansac, Tracking/PoseEstimator.cpp:610-648). TPU-native:
all RANSAC hypotheses solve in parallel — each samples 6 correspondences,
solves the 12-parameter projective DLT by normal-equation eigenvector,
orthogonalizes to SE(3), and scores inliers over all points; the best
hypothesis wins. cv's sequential adaptive iteration count becomes a fixed
hypothesis batch (strictly more work, fully parallel).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import Pose

_EPS = 1e-12


def _dlt_pose(pts3d: jax.Array, xn: jax.Array) -> Pose:
    """6+-point DLT: world points (S, 3) + normalized image coords (S, 2) →
    Pose. Solves A·vec(P) = 0 (2S×12) via the smallest eigenvector of AᵀA
    (batched eigh is TPU-supported; SVD of A is not needed)."""
    S = pts3d.shape[0]
    X = jnp.concatenate([pts3d, jnp.ones((S, 1), pts3d.dtype)], axis=1)  # (S, 4)
    zero = jnp.zeros((S, 4), pts3d.dtype)
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    rows_u = jnp.concatenate([X, zero, -u * X], axis=1)       # (S, 12)
    rows_v = jnp.concatenate([zero, X, -v * X], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)             # (2S, 12)
    AtA = A.T @ A
    w, V = jnp.linalg.eigh(AtA)
    p = V[:, 0]                                               # smallest eigenvalue
    M = p.reshape(3, 4)
    # cheirality: the third row of M gives projective depth up to the global
    # sign — flip M so the majority of the sample is in front BEFORE
    # orthogonalization (keeps R proper)
    w3 = X @ M[2]
    sign = jnp.where(jnp.sum((w3 < 0).astype(jnp.int32)) > (S // 2), -1.0, 1.0)
    M = M * sign
    H = M[:, :3]
    h = M[:, 3]
    # orthogonalize: H = UΣVᵀ → R = U·diag(1,1,det)·Vᵀ, scale = 3/tr(Σ)
    U, s, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(U @ Vt)
    U_fixed = U.at[:, 2].multiply(jnp.sign(d))
    R = U_fixed @ Vt
    scale = 3.0 / jnp.maximum(jnp.sum(s), _EPS)
    t = h * scale
    return Pose(R, t)


class PnPResult(NamedTuple):
    pose: Pose
    inliers: jax.Array     # (M,) bool at the best hypothesis
    num_inliers: jax.Array
    ok: jax.Array


@partial(jax.jit, static_argnames=("hypotheses",))
def pnp_ransac(
    pts3d: jax.Array,      # (M, 3)
    uv: jax.Array,         # (M, 2) undistorted pixels
    valid: jax.Array,      # (M,) bool
    cam: jax.Array,        # (4,) fx fy cx cy
    key: jax.Array,
    max_reprojection_error: float = 8.0,
    min_inliers: int = 10,
    hypotheses: int = 64,
) -> PnPResult:
    M = pts3d.shape[0]
    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    xn = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)

    keys = jax.random.split(key, hypotheses)

    def draw(k):
        g = jax.random.gumbel(k, (M,)) + jnp.where(valid, 0.0, -1e9)
        return jnp.argsort(-g)[:6]

    samples = jax.vmap(draw)(keys)                            # (Hh, 6)
    poses = jax.vmap(lambda s: _dlt_pose(pts3d[s], xn[s]))(samples)

    def score(pose):
        Xc = pose.transform(pts3d)
        z = Xc[:, 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < _EPS, _EPS, z)
        u = fx * Xc[:, 0] * inv_z + cx
        v = fy * Xc[:, 1] * inv_z + cy
        err2 = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
        inl = valid & (z > 0) & (err2 < max_reprojection_error ** 2)
        return inl, jnp.sum(inl.astype(jnp.int32))

    inl, counts = jax.vmap(score)(poses)
    best = jnp.argmax(counts)
    pose = Pose(poses.R[best], poses.t[best])

    # SOLVEPNP_ITERATIVE semantics: Levenberg refinement of the best
    # hypothesis on its inlier set
    from ..ba.pose_only import optimize_pose

    pose, _, _ = optimize_pose(
        pose, cam, pts3d, uv, inl[best].astype(jnp.float32),
        huber_width=0.0, num_iters=8,
    )
    inliers, num = score(pose)
    ok = num >= min_inliers
    return PnPResult(pose=pose, inliers=inliers, num_inliers=num, ok=ok)
