"""Volume of interest: teardrop-kernel confidence volume over keyframe poses.

Replaces VolumeOfInterest/ (294 LoC): each pose contributes a "teardrop"
score field oriented along its viewing direction (VOIKeyframe::TeardropScore,
VolumeOfInterest.cpp:60-79); the interesting volume is the AABB of voxels
whose summed score passes an iteratively-tightened threshold
(CalculateVolumeOfInterest LOD loop, :120-220).

TPU shape: each LOD evaluates a FIXED (G³, KF) score tensor over the current
AABB (the reference sizes a variable voxel grid per LOD from VoxelCountFloor;
a fixed grid per iteration is the static-shape equivalent at comparable
resolution). All keyframes and voxels evaluate in one batched kernel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose


class VoiSettings(NamedTuple):
    """VolumeOfInterestSettings (MageSettings.h:290-307), defaults preserved."""

    away_prominence: float = 1.2
    toward_prominence: float = 0.1
    side_prominence: float = 1.0
    kernel_angle_x: float = 60.0 * jnp.pi / 180.0
    kernel_angle_y: float = 40.0 * jnp.pi / 180.0
    kernel_depth_modifier: float = 1.0
    threshold: float = 0.5
    iterations: int = 3
    grid: int = 24


class VoiKeyframes(NamedTuple):
    """Per-keyframe teardrop kernel parameters (VOIKeyframe ctor)."""

    centroid: jax.Array      # (K, 3)
    forward: jax.Array       # (K, 3)
    dist_alpha_xi: jax.Array   # (K,)
    mod_dist_alpha_omega: jax.Array  # (K,)
    valid: jax.Array         # (K,)


def make_voi_keyframes(poses: Pose, near_depth: jax.Array, far_depth: jax.Array,
                       valid: jax.Array, settings: VoiSettings) -> VoiKeyframes:
    center = poses.center()
    fwd = poses.forward()
    centroid = center + fwd * (near_depth * settings.kernel_depth_modifier)[:, None]
    dist_alpha_xi = near_depth * jnp.tan(
        jnp.minimum(settings.kernel_angle_x, settings.kernel_angle_y))
    mod = (far_depth - near_depth) * settings.away_prominence
    return VoiKeyframes(centroid, fwd, dist_alpha_xi, mod, valid)


def teardrop_scores(kf: VoiKeyframes, points: jax.Array,
                    settings: VoiSettings) -> jax.Array:
    """(P,) summed teardrop score of each point over all keyframes
    (TeardropScore, VolumeOfInterest.cpp:60-79, batched over K×P)."""
    d = points[None, :, :] - kf.centroid[:, None, :]          # (K, P, 3)
    dist = jnp.linalg.norm(d, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    cos_a = jnp.einsum("kpi,ki->kp", d, kf.forward) / safe
    angle = jnp.arccos(jnp.clip(cos_a, -1.0, 1.0))

    half_pi = jnp.pi / 2.0
    parallel_bias = 2.0 * jnp.abs(angle - half_pi) / jnp.pi
    direct_slope = (
        1.0 / kf.mod_dist_alpha_omega[:, None]
        + angle * (1.0 / settings.toward_prominence - 1.0)
        / (kf.mod_dist_alpha_omega[:, None] * jnp.pi)
    )
    angle_factor = parallel_bias * direct_slope + (1.0 - parallel_bias) / (
        kf.dist_alpha_xi[:, None] * settings.side_prominence)
    x = angle_factor * dist
    score = jnp.exp(-2.0 * x * x)
    score = jnp.where(dist < 1e-12, 1.0, score)
    return jnp.sum(jnp.where(kf.valid[:, None], score, 0.0), axis=0)


@partial(jax.jit, static_argnames=("settings",))
def calculate_volume_of_interest(
    kf: VoiKeyframes, settings: VoiSettings = VoiSettings()
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (min_corner (3,), max_corner (3,), ok ()) — the AABB of the
    interesting volume after the LOD refinement loop."""
    G = settings.grid
    big = 1e30
    # initial bounds: keyframe centroids padded by their reach
    pad = jnp.max(jnp.where(kf.valid, kf.mod_dist_alpha_omega, 0.0)) + 1e-3
    lo0 = jnp.min(jnp.where(kf.valid[:, None], kf.centroid, big), axis=0) - pad
    hi0 = jnp.max(jnp.where(kf.valid[:, None], kf.centroid, -big), axis=0) + pad

    lin = jnp.linspace(0.0, 1.0, G)
    gx, gy, gz = jnp.meshgrid(lin, lin, lin, indexing="ij")
    unit = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)  # (G³, 3)

    def lod(carry, lod_idx):
        lo, hi = carry
        pts = lo[None, :] + unit * (hi - lo)[None, :]
        scores = teardrop_scores(kf, pts, settings)
        smin = jnp.min(scores)
        smax = jnp.max(scores)
        # threshold tightens as lod decreases (Threshold / lod, :196)
        lvl = (settings.iterations - lod_idx).astype(jnp.float32)
        thr = (smax - smin) * (settings.threshold / lvl) + smin
        keep = scores > thr
        lo_n = jnp.min(jnp.where(keep[:, None], pts, big), axis=0)
        hi_n = jnp.max(jnp.where(keep[:, None], pts, -big), axis=0)
        any_keep = jnp.any(keep)
        lo = jnp.where(any_keep, lo_n, lo)
        hi = jnp.where(any_keep, hi_n, hi)
        return (lo, hi), any_keep

    (lo, hi), kept = jax.lax.scan(
        lod, (lo0, hi0), jnp.arange(settings.iterations))
    ok = jnp.any(kf.valid) & kept[-1]
    return lo, hi, ok
