"""rBRIEF binary descriptors, computed as dense whole-image bit planes.

The reference (ComputeOrbDescriptorsPrerotated, OpenCVModified.cpp:502) walks
keypoints and samples a prerotated 256-pair pattern around each. The TPU-native
inversion: for the unrotated path (golden path — UseOrientation=false,
MageSettings.h:158) compute each pattern bit for *every pixel at once* as a
comparison of two statically-shifted views of the blurred image, pack 32 bits
per uint32 word into an (8, H, W) tensor, then gather one row per keypoint.
Zero per-keypoint work, no serial loops, and XLA fuses the 512 shifted
comparisons into a few elementwise passes over the padded frame.

The oriented path (steered BRIEF) rotates the pattern per keypoint and
bilinearly samples — a (N, 512)-point gather, used only when orientation is on.

The pattern itself is *not* copied from OpenCV's learned bit_pattern tables:
pairs are drawn from the original BRIEF recipe (iid Gaussian, sigma = patch/5,
clipped to the patch) with a fixed seed. Descriptors only ever match against
descriptors produced by this same pattern, so internal consistency — not the
specific table — is what matters. (The reference itself falls back to
MakeRandomPattern for non-15/31 patch sizes, OpenCVModified.cpp:877-884.)
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

DESCRIPTOR_BITS = 256
DESCRIPTOR_WORDS = 8  # uint32 words


@lru_cache(maxsize=None)
def brief_pattern(patch_size: int = 15, seed: int = 0x5EED) -> np.ndarray:
    """(256, 2, 2) int32 sample-offset pairs [(dx1,dy1),(dx2,dy2)] within the patch."""
    half = patch_size // 2
    sigma = patch_size / 5.0
    rs = np.random.RandomState(seed)
    pts = np.clip(np.round(rs.randn(DESCRIPTOR_BITS, 2, 2) * sigma), -half, half)
    # nudge degenerate pairs (identical sample points give constant bits)
    for i in range(DESCRIPTOR_BITS):
        while np.all(pts[i, 0] == pts[i, 1]):
            pts[i, 1] = np.clip(np.round(rs.randn(2) * sigma), -half, half)
    return pts.astype(np.int32)


def _shifted(img: jax.Array, dx: int, dy: int, pad: int) -> jax.Array:
    h, w = img.shape
    p = jnp.pad(img, pad)
    return jax.lax.dynamic_slice(p, (pad + dy, pad + dx), (h, w))


@partial(jax.jit, static_argnames=("patch_size",))
def descriptor_bit_planes(blurred: jax.Array, patch_size: int = 15) -> jax.Array:
    """(DESCRIPTOR_WORDS, H, W) uint32 packed descriptor planes for every pixel."""
    pattern = brief_pattern(patch_size)
    pad = int(np.abs(pattern).max()) + 1
    words = []
    for w in range(DESCRIPTOR_WORDS):
        acc = jnp.zeros(blurred.shape, jnp.uint32)
        for b in range(32):
            (x1, y1), (x2, y2) = pattern[w * 32 + b]
            bit = _shifted(blurred, int(x1), int(y1), pad) < _shifted(
                blurred, int(x2), int(y2), pad
            )
            acc = acc | (bit.astype(jnp.uint32) << np.uint32(b))
        words.append(acc)
    return jnp.stack(words)


@jax.jit
def gather_descriptors(planes: jax.Array, xy: jax.Array) -> jax.Array:
    """planes (8, H, W) uint32, xy (N, 2) float pixel coords → (N, 8) uint32."""
    x = jnp.clip(xy[:, 0].astype(jnp.int32), 0, planes.shape[2] - 1)
    y = jnp.clip(xy[:, 1].astype(jnp.int32), 0, planes.shape[1] - 1)
    return planes[:, y, x].T  # (N, 8)


@partial(jax.jit, static_argnames=("patch_size",))
def oriented_descriptors(
    blurred: jax.Array, xy: jax.Array, angle: jax.Array, patch_size: int = 15
) -> jax.Array:
    """Steered-BRIEF descriptors: rotate the pattern by each keypoint's angle and
    sample with nearest-neighbor reads (the reference rounds prerotated integer
    offsets — OpenCVModified.cpp:502-560). xy (N,2), angle (N,) radians → (N,8) u32."""
    pattern = jnp.asarray(brief_pattern(patch_size), jnp.float32)  # (256,2,2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    # rotated offsets: (N, 256, 2, 2)
    ox = pattern[None, ..., 0]
    oy = pattern[None, ..., 1]
    rx = jnp.round(ox * ca[:, None, None] - oy * sa[:, None, None])
    ry = jnp.round(ox * sa[:, None, None] + oy * ca[:, None, None])
    px = jnp.clip(xy[:, None, None, 0] + rx, 0, blurred.shape[1] - 1).astype(jnp.int32)
    py = jnp.clip(xy[:, None, None, 1] + ry, 0, blurred.shape[0] - 1).astype(jnp.int32)
    vals = blurred[py, px]  # (N, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    bits = bits.reshape(bits.shape[0], DESCRIPTOR_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)
