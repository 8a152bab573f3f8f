"""ORB front end: pyramid → FAST → ANMS → rBRIEF → undistort, fixed shapes.

The TPU replacement for OrbDetector::DetectAndCompute + OrbFeatureDetector
(Image/OpenCVModified.cpp:771-886, Image/OrbFeatureDetector.cpp:84-122):
one jitted function from a grayscale frame to a padded FrameFeatures bundle
(MaxFeatures slots + validity mask). Per-level work is unrolled statically —
level shapes are compile-time constants, matching XLA's static-shape model.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FeatureExtractorSettings
from ..geometry import camera as cam_mod
from . import anms as anms_mod
from . import fast as fast_mod
from . import image as image_mod
from . import orb as orb_mod

# per-level candidate pool (pre-ANMS); generous vs the reference's dynamic vectors
CANDIDATES_PER_LEVEL = 2048


class FrameFeatures(NamedTuple):
    """Fixed-shape analyzed-frame bundle (the reference's AnalyzedImage,
    Image/AnalyzedImage.h:25-60, minus the cv::Mat plumbing)."""

    xy: jax.Array        # (N, 2) f32 — level-0 distorted pixel coords
    und_xy: jax.Array    # (N, 2) f32 — undistorted pixel coords (matching space)
    response: jax.Array  # (N,) f32
    octave: jax.Array    # (N,) int32
    angle: jax.Array     # (N,) f32 radians (0 when UseOrientation=false)
    desc: jax.Array      # (N, 8) uint32 — 256-bit rBRIEF
    valid: jax.Array     # (N,) bool

    @property
    def count(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))


def _level_features(
    img: jax.Array,
    n_level: int,
    scale: float,
    level: int,
    fes: FeatureExtractorSettings,
):
    """Detect + describe on one pyramid level; returns fixed n_level slots."""
    border = fes.ImageBorder
    score = fast_mod.fast_score_map(img, fes.FastThreshold)
    score = fast_mod.nms3x3(score)
    xy, resp, valid = fast_mod.extract_candidates(score, CANDIDATES_PER_LEVEL, border)

    if fes.SpatialFeatureSelection:
        # EXTENSION path: per-cell round-robin selection replaces the global
        # response cut + ANMS (see config.py SpatialFeatureSelection)
        valid = anms_mod.spatial_select(
            xy, resp, valid, n_level, img.shape[1], img.shape[0],
            fes.SpatialSelectionGridX, fes.SpatialSelectionGridY,
        )
    else:
        max_num = int(n_level * fes.FeatureFactor)
        valid = anms_mod.retain_best_features(
            resp, valid, n_level, max_num, fes.FastThreshold, fes.FeatureStrength
        )
        valid = anms_mod.adaptive_nms(
            xy, resp, valid, n_level, fes.FastThreshold, fes.StrongResponse,
            fes.MinRobustnessFactor, fes.MaxRobustnessFactor,
        )

    # compact survivors into exactly n_level slots (strongest first)
    key = jnp.where(valid, resp + 1.0, -jnp.inf)
    _, idx = jax.lax.top_k(key, n_level)
    xy = xy[idx]
    resp = resp[idx]
    valid = valid[idx]

    blurred = image_mod.gaussian_blur(img, fes.GaussianKernelSize, 2.0)
    if fes.UseOrientation:
        angle_map = image_mod.ic_angle_map(img, fes.PatchSize // 2)
        ax = jnp.clip(xy[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
        ay = jnp.clip(xy[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)
        angle = jnp.where(valid, angle_map[ay, ax], 0.0)
        desc = orb_mod.oriented_descriptors(blurred, xy, angle, fes.PatchSize)
    else:
        angle = jnp.zeros((n_level,), jnp.float32)
        planes = orb_mod.descriptor_bit_planes(blurred, fes.PatchSize)
        desc = orb_mod.gather_descriptors(planes, xy)

    octave = jnp.full((n_level,), level, jnp.int32)
    return xy * scale, resp, octave, angle, desc, valid


@partial(jax.jit, static_argnames=("fes", "max_features"))
def detect_and_compute(
    image: jax.Array,
    cam: jax.Array,
    fes: FeatureExtractorSettings,
    max_features: int = 512,
) -> FrameFeatures:
    """Full front end for one grayscale frame (f32, [0,255], (H, W)).

    Output arrays are padded to `max_features` slots; invalid slots have
    valid=False and xy placed at (-1e6) so radius matchers never hit them.
    Accepts uint8 frames (camera-native; 4× less HBM traffic than f32 on
    banked streams) — converted here INSIDE the jit, never eagerly.
    """
    if image.dtype != jnp.float32:
        image = image.astype(jnp.float32)
    levels = image_mod.build_pyramid(image, fes.NumLevels, fes.ScaleFactor)
    n_per_level = image_mod.features_per_level(
        fes.NumFeatures, fes.NumLevels, fes.ScaleFactor
    )
    parts = []
    for level, img in enumerate(levels):
        scale = fes.ScaleFactor**level
        parts.append(_level_features(img, n_per_level[level], scale, level, fes))

    xy = jnp.concatenate([p[0] for p in parts])
    resp = jnp.concatenate([p[1] for p in parts])
    octave = jnp.concatenate([p[2] for p in parts])
    angle = jnp.concatenate([p[3] for p in parts])
    desc = jnp.concatenate([p[4] for p in parts])
    valid = jnp.concatenate([p[5] for p in parts])

    n = xy.shape[0]
    if n > max_features:
        raise ValueError(f"NumFeatures {n} exceeds max_features budget {max_features}")
    pad = max_features - n
    if pad:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        resp = jnp.pad(resp, (0, pad))
        octave = jnp.pad(octave, (0, pad))
        angle = jnp.pad(angle, (0, pad))
        desc = jnp.pad(desc, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))

    und = cam_mod.undistort_pixels(cam, xy)
    # park invalid slots far away so spatial matchers can't select them
    far = jnp.float32(-1e6)
    xy = jnp.where(valid[:, None], xy, far)
    und = jnp.where(valid[:, None], und, far)

    return FrameFeatures(xy, und, jnp.where(valid, resp, 0.0), octave, angle, desc, valid)
