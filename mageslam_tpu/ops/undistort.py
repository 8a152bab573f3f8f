"""Dense image undistortion + stereo rescale (the ImagePreprocessor rewrite).

Replaces Image/ImagePreprocessor.{h,cpp} (~230 LoC):
  - `undistorted_calibration` — CalculateUndistortedCalibration
    (ImagePreprocessor.cpp:77-105): keep the distorted fx/fy, move the
    principal point to the image center (the reference found this beats
    cv::getOptimalNewCameraMatrix on their BVT suite).
  - `undistort_image` — UndistortImage (:106-120): the
    cv::initUndistortRectifyMap + cv::remap pair as ONE precomputed (H, W, 2)
    source-coordinate grid and a jitted bilinear gather. The map is built
    inside jit, so XLA caches it per (shape, calibration) compilation — the
    analogue of the reference's cached m_undistortionMap1/2.
  - `overlap_crop_source_in_target` / `scale_for_camera_configuration` —
    ScaleImageForCameraConfiguration (:18-66): project the source frustum
    into the target camera at the stereo max depth, take the bounding box,
    and resize the source image by max(crop/source) so the pair analyzes at
    matched angular resolution (ImageAnalyzer.cpp:131-240 stereo path).

All functions take the flat (16,) camera parameter vector of
geometry.camera (fx fy cx cy k1..k6 p1 p2 w h model pad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera as cam_mod
from ..geometry.se3 import Pose


def undistorted_calibration(cam16: jax.Array) -> jax.Array:
    """Pinhole calibration for the undistorted image space: distorted fx/fy,
    principal point at the image center (ImagePreprocessor.cpp:88-92)."""
    w, h = cam16[12], cam16[13]
    out = jnp.zeros_like(cam16)
    out = out.at[0].set(cam16[0]).at[1].set(cam16[1])
    out = out.at[2].set(w * 0.5).at[3].set(h * 0.5)
    return out.at[12].set(w).at[13].set(h).at[14].set(cam_mod.MODEL_PINHOLE)


def undistort_rectify_map(cam16: jax.Array, und_cam16: jax.Array,
                          height: int, width: int) -> jax.Array:
    """(H, W, 2) distorted-source pixel coordinate per undistorted output
    pixel (cv::initUndistortRectifyMap semantics): output px → normalized
    under the undistorted calibration → distort → distorted-camera pixel."""
    u, v = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                        jnp.arange(height, dtype=jnp.float32))
    px = jnp.stack([u, v], axis=-1)
    xn = cam_mod.pixel_to_normalized(und_cam16, px)
    xd = cam_mod.distort_normalized(cam16, xn)
    su = cam16[0] * xd[..., 0] + cam16[2]
    sv = cam16[1] * xd[..., 1] + cam16[3]
    return jnp.stack([su, sv], axis=-1)


def remap_bilinear(image: jax.Array, map_xy: jax.Array) -> jax.Array:
    """cv::remap with INTER_LINEAR: sample `image` (H, W) at map_xy (H', W', 2);
    out-of-bounds samples clamp to the border (BORDER_REPLICATE-ish — the
    frontend's border culling discards features there anyway)."""
    H, W = image.shape
    x = jnp.clip(map_xy[..., 0], 0.0, W - 1.0)
    y = jnp.clip(map_xy[..., 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    wx = x - x0
    wy = y - y0
    i00 = image[y0, x0]
    i01 = image[y0, x0 + 1]
    i10 = image[y0 + 1, x0]
    i11 = image[y0 + 1, x0 + 1]
    return (1 - wy) * ((1 - wx) * i00 + wx * i01) + wy * ((1 - wx) * i10 + wx * i11)


def undistort_image(image: jax.Array, cam16: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Warp a distorted image to its undistorted pinhole space. Returns
    (undistorted image, undistorted calibration). Jit-safe; the map is
    compile-time constant-folded per calibration."""
    H, W = image.shape
    und = undistorted_calibration(cam16)
    m = undistort_rectify_map(cam16, und, H, W)
    return remap_bilinear(image, m), und


def overlap_crop_source_in_target(
    src_cam16: jax.Array,
    tgt_cam16: jax.Array,
    target_to_source: Pose,     # rigid transform: target-camera frame → source
    max_depth: float,
) -> jax.Array:
    """Bounding box (x0, y0, w, h) of the source frame projected into the
    target image (CalculateOverlapCropSourceInTarget semantics): unproject
    the source image corners at `max_depth`, move them into the target
    camera, project with the target calibration."""
    sw, sh = src_cam16[12], src_cam16[13]
    corners = jnp.stack([
        jnp.stack([0.0, 0.0]), jnp.stack([sw, 0.0]),
        jnp.stack([0.0, sh]), jnp.stack([sw, sh]),
    ])                                                    # (4, 2) source px
    xn = cam_mod.undistort_normalized(
        src_cam16, cam_mod.pixel_to_normalized(src_cam16, corners))
    rays = jnp.concatenate([xn, jnp.ones((4, 1))], axis=-1) * max_depth
    # source-camera points → target camera: inverse of target→source
    pts_t = target_to_source.inverse().transform(rays)
    uv, z = cam_mod.project_camera_points(tgt_cam16, pts_t)
    # corners behind the target camera cannot contribute to the crop
    front = z > 0
    big = jnp.float32(1e9)
    x0 = jnp.min(jnp.where(front, uv[:, 0], big))
    y0 = jnp.min(jnp.where(front, uv[:, 1], big))
    x1 = jnp.max(jnp.where(front, uv[:, 0], -big))
    y1 = jnp.max(jnp.where(front, uv[:, 1], -big))
    w = jnp.where(jnp.any(front), x1 - x0, 0.0)
    h = jnp.where(jnp.any(front), y1 - y0, 0.0)
    return jnp.stack([x0, y0, w, h])


def scale_for_camera_configuration(
    src_cam16: jax.Array,
    tgt_cam16: jax.Array,
    target_to_source: Pose,
    max_depth: float,
) -> tuple[jax.Array, jax.Array]:
    """(scale, overlap_ok): resize factor bringing the source image to the
    target's angular resolution (ScaleImageForCameraConfiguration
    heuristic: max of the crop/source ratios), and whether the frusta
    overlap at all inside the target frame."""
    crop = overlap_crop_source_in_target(src_cam16, tgt_cam16,
                                         target_to_source, max_depth)
    sw, sh = src_cam16[12], src_cam16[13]
    tw, th = tgt_cam16[12], tgt_cam16[13]
    scale = jnp.maximum(crop[2] / sw, crop[3] / sh)
    ok = ((crop[0] + crop[2] > 0) & (crop[0] < tw)
          & (crop[1] + crop[3] > 0) & (crop[1] < th) & (scale > 0))
    return scale, ok


def rescale_image(image: jax.Array, scale: float,
                  out_height: int, out_width: int) -> jax.Array:
    """Bilinear resize by `scale` into a fixed (out_height, out_width) frame
    (XLA needs static output shapes; the scaled image occupies the top-left
    crop, padding replicates the border). Scaled intrinsics = intrinsics ×
    scale (GetScaledIntrinsics)."""
    u, v = jnp.meshgrid(jnp.arange(out_width, dtype=jnp.float32),
                        jnp.arange(out_height, dtype=jnp.float32))
    inv = 1.0 / jnp.maximum(scale, 1e-6)
    return remap_bilinear(image, jnp.stack([u * inv, v * inv], axis=-1))
