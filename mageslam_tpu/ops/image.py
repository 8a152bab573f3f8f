"""Image ops: Gaussian blur, bilinear resize, pyramid construction.

Replaces the reference's OpenCV image plumbing (OpenCVModified.cpp:795-865):
resize(INTER_LINEAR) pyramid + GaussianBlur(ksize=GaussianKernelSize, sigma=2,
BORDER_REFLECT_101) before descriptor extraction. Images are float32 [0,255]
single-channel throughout — u8 arithmetic buys nothing on TPU, and f32 keeps
XLA fusion simple.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel-compatible 1D kernel."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: jax.Array, ksize: int = 7, sigma: float = 2.0) -> jax.Array:
    """Separable Gaussian blur with REFLECT_101 border (matches the reference's
    GaussianBlur call, OpenCVModified.cpp:862)."""
    if ksize <= 1:
        return img
    k = jnp.asarray(gaussian_kernel_1d(ksize, sigma))
    pad = ksize // 2
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="reflect")
    # rows then cols via 1D convs mapped over the other axis
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    return x


def resize_bilinear(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """cv2 INTER_LINEAR-convention resize (half-pixel centers, no antialias)."""
    return jax.image.resize(img, (out_h, out_w), method="linear", antialias=False)


def pyramid_shapes(h: int, w: int, num_levels: int, scale_factor: float) -> list[tuple[int, int]]:
    """Per-level sizes: level i is round(dim / scale^i) (OpenCVModified.cpp:798-800)."""
    shapes = []
    for level in range(num_levels):
        s = scale_factor**level
        shapes.append((int(round(h / s)), int(round(w / s))))
    return shapes


@partial(jax.jit, static_argnames=("num_levels", "scale_factor"))
def build_pyramid(img: jax.Array, num_levels: int, scale_factor: float) -> list[jax.Array]:
    """List of per-level images; level i+1 resized from level i (the reference
    resizes from the previous level, OpenCVModified.cpp:820-842)."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, num_levels, scale_factor)
    levels = [img]
    for lh, lw in shapes[1:]:
        levels.append(resize_bilinear(levels[-1], lh, lw))
    return levels


def level_scales(num_levels: int, scale_factor: float) -> np.ndarray:
    return np.array([scale_factor**i for i in range(num_levels)], np.float32)


def features_per_level(n_features: int, num_levels: int, scale_factor: float) -> list[int]:
    """Geometric per-level feature budget (OpenCVModified.cpp:660-670)."""
    if num_levels == 1:
        return [n_features]
    factor = 1.0 / scale_factor
    n_desired = n_features * (1 - factor) / (1 - factor**num_levels)
    out = []
    total = 0
    for level in range(num_levels - 1):
        n = int(round(n_desired))
        out.append(n)
        total += n
        n_desired *= factor
    out.append(max(n_features - total, 0))
    return out


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ic_angle_map(img: jax.Array, half_patch: int) -> jax.Array:
    """Dense intensity-centroid angle map (radians): atan2(m01, m10) with the
    circular patch of radius half_patch at every pixel (ICAngles,
    OpenCVModified.cpp:399 — computed per keypoint there; dense conv here is the
    TPU-native form: two small convolutions instead of per-keypoint loops)."""
    r = half_patch
    ys, xs = np.mgrid[-r : r + 1, -r : r + 1]
    # the reference uses the standard ORB circular mask: |dx| <= u_max[|dy|]
    mask = (xs * xs + ys * ys) <= (r * r + 1)
    wx = (xs * mask).astype(np.float32)
    wy = (ys * mask).astype(np.float32)

    def conv2(x, k):
        return jax.lax.conv_general_dilated(
            x[None, None], jnp.asarray(k)[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    # correlation = conv with flipped kernel; our kernels are antisymmetric
    m10 = conv2(img, wx[::-1, ::-1])
    m01 = conv2(img, wy[::-1, ::-1])
    return jnp.arctan2(m01, m10)
