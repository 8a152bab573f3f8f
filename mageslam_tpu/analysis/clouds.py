"""Point cloud denoising: kNN, PCA normals, mollification, repositioning.

Replaces Clouds/DeNoising.{h,cpp} (686 LoC) — the offline cleanup applied to
fossilized map clouds. The reference builds a spatial kNN index and runs
per-point loops with OS-thread parallelism; on TPU the whole cloud processes
as dense batched linear algebra (clouds are ≤ tens of thousands of points —
an (N, N) distance matrix is trivial):

  - `knn`: top-k via one pairwise distance matrix (DeNoising.h Knn struct)
  - `compute_normals`: per-point PCA of the kNN neighborhood — batched 3×3
    eigh, smallest eigenvector, sign-aligned to the previous normal
    (DeNoising.cpp:128-191)
  - `mollify_normals`: joint bilateral smoothing with Gaussian weights
    exp(-(‖ni-nj‖²/σn² + ‖vi-vj‖²/σs²)) (DeNoising.cpp:248-295)
  - `compute_characteristics`: homogeneity (mean neighbor distance),
    distance score, effective dissimilarity Σ ‖v∥‖²/(‖v⊥‖²+ε)
    (DeNoising.cpp:193-246)
  - `reposition_points`: bilateral-normal projection steps — each point moves
    along its mollified normal toward the Gaussian-weighted neighborhood
    plane (the WLOP-style RepositionPointSets, :327-…)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = 1e30


def knn(points: jax.Array, valid: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """(N, k) neighbor indices + distances (self excluded)."""
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    N = points.shape[0]
    d2 = jnp.where(valid[None, :] & valid[:, None], d2, _BIG)
    d2 = d2 + jnp.eye(N) * _BIG
    neg, idx = jax.lax.top_k(-d2, k)
    return idx, jnp.sqrt(jnp.maximum(-neg, 0.0))


def compute_normals(points: jax.Array, valid: jax.Array, neighbors: jax.Array,
                    prev_normals: jax.Array | None = None) -> jax.Array:
    """(N, 3) unit normals: smallest principal axis of each kNN neighborhood."""
    nb = points[neighbors]                                    # (N, k, 3)
    mean = jnp.mean(nb, axis=1, keepdims=True)
    c = nb - mean
    cov = jnp.einsum("nki,nkj->nij", c, c)                    # (N, 3, 3)
    w, V = jnp.linalg.eigh(cov)
    normal = V[:, :, 0]                                       # smallest eigval
    if prev_normals is not None:
        flip = jnp.sum(normal * prev_normals, axis=-1) < 0
        normal = jnp.where(flip[:, None], -normal, normal)
    return normal


def mollify_normals(points: jax.Array, normals: jax.Array, valid: jax.Array,
                    normal_scale: float, spatial_scale: float,
                    iterations: int = 1) -> jax.Array:
    """Bilateral normal smoothing (DeNoising.cpp MollifyNormals)."""
    def one(normals):
        dn = jnp.sum((normals[:, None, :] - normals[None, :, :]) ** 2, axis=-1)
        dv = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        w = jnp.exp(-(dn / (normal_scale * normal_scale)
                      + dv / (spatial_scale * spatial_scale)))
        w = jnp.where(valid[None, :] & valid[:, None], w, 0.0)
        summed = jnp.einsum("ij,jk->ik", w, normals)
        return summed / jnp.maximum(
            jnp.linalg.norm(summed, axis=-1, keepdims=True), 1e-12)

    for _ in range(iterations):
        normals = one(normals)
    return normals


def compute_characteristics(points: jax.Array, normals: jax.Array,
                            valid: jax.Array, neighbors: jax.Array,
                            distances: jax.Array):
    """(effective_dissimilarity, distance_score, homogeneity) per point
    (ComputeCharacteristics, DeNoising.cpp:193-246)."""
    nb = points[neighbors]                                    # (N, k, 3)
    v = nb - points[:, None, :]
    n = normals[neighbors]                                    # (N, k, 3)
    par = jnp.sum(v * n, axis=-1, keepdims=True) * n          # component ∥ normal
    perp = v - par
    dissim = jnp.sum(par * par, axis=-1) / (jnp.sum(perp * perp, axis=-1) + 1e-4)
    effective = jnp.sum(dissim, axis=1)
    homogeneity = jnp.mean(distances, axis=1)
    distance_score = jnp.max(distances, axis=1)
    mask = valid.astype(jnp.float32)
    return effective * mask, distance_score * mask, homogeneity * mask


@partial(jax.jit, static_argnames=("steps", "k"))
def reposition_points(points: jax.Array, valid: jax.Array,
                      sigma_s: float = 0.1, moll_sigma_n: float = 0.5,
                      moll_sigma_s: float = 0.2, step: float = 0.3,
                      steps: int = 3, k: int = 8) -> jax.Array:
    """Denoise: iteratively project each point along its (mollified) normal
    toward the Gaussian-weighted plane of its neighborhood."""
    def body(points, _):
        nbr, dist = knn(points, valid, k)
        normals = compute_normals(points, valid, nbr)
        normals = mollify_normals(points, normals, valid, moll_sigma_n, moll_sigma_s)
        nb = points[nbr]
        w = jnp.exp(-dist * dist / (sigma_s * sigma_s))       # (N, k)
        # signed distance of each neighbor's offset along the point's normal
        off = jnp.einsum("nki,ni->nk", nb - points[:, None, :], normals)
        corr = jnp.sum(w * off, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)
        moved = points + step * corr[:, None] * normals
        return jnp.where(valid[:, None], moved, points), None

    points, _ = jax.lax.scan(body, points, None, length=steps)
    return points
