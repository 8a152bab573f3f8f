"""Camera models: pinhole + Poly3K / Rational6K distortion, LinearFocalLengthModel.

Mirrors the reference's camera models (Core/MAGESLAM/Source/Data/Data.h:174-330):
  - PinholeCameraModel: fx, fy, cx, cy, no distortion
  - Poly3KCameraModel: distortion [k1, k2, k3, p1, p2]  (OpenCV order k1,k2,p1,p2,k3
    is *not* used — the reference stores k1,k2,k3,p1,p2; conversion helpers below)
  - Rational6KCameraModel: [k1..k6, p1, p2]
  - LinearFocalLengthModel: focus-value-dependent intrinsics (Data.h:263-380)

TPU-first design: a camera is a flat (16,) float32 parameter vector usable inside
any jitted kernel, batched over keyframes as (K, 16). Layout:

    [fx, fy, cx, cy, k1, k2, k3, k4, k5, k6, p1, p2, width, height, model, pad]

`model` is 0=pinhole, 1=poly3k, 2=rational6k; distortion evaluation is branchless
(unused coefficients are zero, and the rational denominator reduces to 1), so a
single compiled projection path serves all three models.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CAM_PARAMS = 16
MODEL_PINHOLE = 0.0
MODEL_POLY3K = 1.0
MODEL_RATIONAL6K = 2.0


def make_pinhole(fx, fy, cx, cy, width, height) -> jax.Array:
    v = jnp.zeros((CAM_PARAMS,), jnp.float32)
    v = v.at[0].set(fx).at[1].set(fy).at[2].set(cx).at[3].set(cy)
    return v.at[12].set(width).at[13].set(height).at[14].set(MODEL_PINHOLE)


def make_poly3k(fx, fy, cx, cy, k1, k2, k3, p1, p2, width, height) -> jax.Array:
    """Reference coefficient order: k1, k2, k3, p1, p2 (Data.h:191,210)."""
    v = make_pinhole(fx, fy, cx, cy, width, height)
    v = v.at[4].set(k1).at[5].set(k2).at[6].set(k3).at[10].set(p1).at[11].set(p2)
    return v.at[14].set(MODEL_POLY3K)


def make_rational6k(fx, fy, cx, cy, k1, k2, k3, k4, k5, k6, p1, p2, width, height) -> jax.Array:
    """Reference coefficient order: k1..k6, p1, p2 (Data.h:222,247)."""
    v = make_pinhole(fx, fy, cx, cy, width, height)
    v = v.at[4].set(k1).at[5].set(k2).at[6].set(k3).at[7].set(k4).at[8].set(k5).at[9].set(k6)
    v = v.at[10].set(p1).at[11].set(p2)
    return v.at[14].set(MODEL_RATIONAL6K)


def fx(cam):  # noqa: D103
    return cam[..., 0]


def fy(cam):  # noqa: D103
    return cam[..., 1]


def cx(cam):  # noqa: D103
    return cam[..., 2]


def cy(cam):  # noqa: D103
    return cam[..., 3]


def image_size(cam):
    """(width, height)."""
    return cam[..., 12], cam[..., 13]


def distort_normalized(cam: jax.Array, xn: jax.Array) -> jax.Array:
    """Apply radial+tangential distortion to normalized coords (..., 2).

    Rational model: scale = (1 + k1 r² + k2 r⁴ + k3 r⁶) / (1 + k4 r² + k5 r⁴ + k6 r⁶)
    Poly3K is the k4=k5=k6=0 special case. Tangential: p1, p2 (OpenCV convention).
    cam broadcasts against xn's batch dims.
    """
    x, y = xn[..., 0], xn[..., 1]
    k1, k2, k3 = cam[..., 4], cam[..., 5], cam[..., 6]
    k4, k5, k6 = cam[..., 7], cam[..., 8], cam[..., 9]
    p1, p2 = cam[..., 10], cam[..., 11]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
    scale = num / den
    xy = x * y
    xd = x * scale + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * scale + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: jax.Array, xd: jax.Array, iters: int = 8) -> jax.Array:
    """Invert `distort_normalized` by fixed-point iteration (cv::undistortPoints
    semantics — the reference undistorts keypoints once per frame,
    Image/OrbFeatureDetector.cpp:30-62)."""
    k1, k2, k3 = cam[..., 4], cam[..., 5], cam[..., 6]
    k4, k5, k6 = cam[..., 7], cam[..., 8], cam[..., 9]
    p1, p2 = cam[..., 10], cam[..., 11]
    x0, y0 = xd[..., 0], xd[..., 1]
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        r4 = r2 * r2
        r6 = r4 * r2
        num = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
        den = 1.0 + k4 * r2 + k5 * r4 + k6 * r6
        inv_scale = den / num
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) * inv_scale
        y = (y0 - dy) * inv_scale
    return jnp.stack([x, y], axis=-1)


def project_camera_points(cam: jax.Array, pts_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Camera-frame points (..., 3) → distorted pixel coords (..., 2), plus depth.

    The z-divide is guarded; callers must mask with depth > 0 (cheirality —
    the reference's behind-camera outlier test, BundlerLib.cpp:399-436).
    """
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    xn = pts_cam[..., :2] * inv_z[..., None]
    xd = distort_normalized(cam, xn)
    u = cam[..., 0] * xd[..., 0] + cam[..., 2]
    v = cam[..., 1] * xd[..., 1] + cam[..., 3]
    return jnp.stack([u, v], axis=-1), z


def project_undistorted(cam: jax.Array, pts_cam: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pinhole-only projection of camera-frame points (the reference runs the whole
    pipeline on *undistorted* keypoints — Tracking/Reprojection.cpp ProjectUndistorted —
    so BA residuals use this, not the distorted projection)."""
    z = pts_cam[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    u = cam[..., 0] * pts_cam[..., 0] * inv_z + cam[..., 2]
    v = cam[..., 1] * pts_cam[..., 1] * inv_z + cam[..., 3]
    return jnp.stack([u, v], axis=-1), z


def pixel_to_normalized(cam: jax.Array, px: jax.Array) -> jax.Array:
    """Pixel (..., 2) → normalized image coords (no distortion handling)."""
    x = (px[..., 0] - cam[..., 2]) / cam[..., 0]
    y = (px[..., 1] - cam[..., 3]) / cam[..., 1]
    return jnp.stack([x, y], axis=-1)


def undistort_pixels(cam: jax.Array, px: jax.Array, iters: int = 8) -> jax.Array:
    """Distorted pixels → undistorted pixels under the same pinhole intrinsics
    (what OrbFeatureDetector does to keypoints: undistort with P = K)."""
    xn = undistort_normalized(cam, pixel_to_normalized(cam, px), iters=iters)
    u = cam[..., 0] * xn[..., 0] + cam[..., 2]
    v = cam[..., 1] * xn[..., 1] + cam[..., 3]
    return jnp.stack([u, v], axis=-1)


def k_matrix(cam: jax.Array) -> jax.Array:
    """3x3 intrinsics matrix."""
    z = jnp.zeros_like(cam[..., 0])
    o = jnp.ones_like(cam[..., 0])
    return jnp.stack(
        [
            jnp.stack([cam[..., 0], z, cam[..., 2]], axis=-1),
            jnp.stack([z, cam[..., 1], cam[..., 3]], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


class LinearFocalLengthModel(NamedTuple):
    """Focus-value-dependent intrinsics (Data.h:263-380): fx/fy are linear in the
    focus value: f(focus) = m * focus + b, in units of the calibration size;
    cx, cy fixed. Produces a camera parameter vector for a given focus + resolution.
    """

    fx_m: float
    fx_b: float
    fy_m: float
    fy_b: float
    cx: float
    cy: float
    calibration_width: int
    calibration_height: int
    focal_bound_lo: float = 0.0
    focal_bound_hi: float = 0.0
    distortion: tuple[float, ...] = ()  # (), (k1,k2,k3,p1,p2) or (k1..k6,p1,p2)

    def camera_at(self, focus: float, width: int, height: int) -> jax.Array:
        sx = width / self.calibration_width
        sy = height / self.calibration_height
        f = jnp.clip(
            jnp.asarray(focus, jnp.float32),
            self.focal_bound_lo,
            self.focal_bound_hi if self.focal_bound_hi > 0 else jnp.inf,
        )
        fx_v = (self.fx_m * f + self.fx_b) * self.calibration_width * sx
        fy_v = (self.fy_m * f + self.fy_b) * self.calibration_height * sy
        cx_v = self.cx * self.calibration_width * sx
        cy_v = self.cy * self.calibration_height * sy
        d = self.distortion
        if len(d) == 0:
            return make_pinhole(fx_v, fy_v, cx_v, cy_v, width, height)
        if len(d) == 5:
            return make_poly3k(fx_v, fy_v, cx_v, cy_v, *d, width, height)
        if len(d) == 8:
            return make_rational6k(fx_v, fy_v, cx_v, cy_v, *d, width, height)
        raise ValueError("distortion must have 0, 5 (poly3k) or 8 (rational6k) coeffs")
