"""Frame-to-frame FAST keypoint repeatability on the photoreal renderer.

The golden-path settings fail on the rendered orbit not because of the
pipeline but because the renderer's keypoint repeatability (~50% under
motion at FAST threshold 4) is below a real camera's 70-85% (EVAL.md
"honest-blocked", VERDICT r4 weak #4). This harness MEASURES that number so
renderer changes (supersampling factor, PSF, noise placement) are validated
by data, not vibes.

Protocol (the standard detector-repeatability measure, restricted to
co-visible regions): for consecutive orbit frames i, i+1 —
  1. extract keypoints in both (the production frontend, golden settings);
  2. reproject frame-i keypoints into frame i+1 through the renderer's
     ground-truth ray depth (render_frame(..., return_depth=True));
  3. a keypoint REPEATS if a frame-(i+1) keypoint lies within `radius` px
     of its reprojection (and its reprojection is inside the view and not
     occlusion-masked: reprojected depth must match the i+1 depth map);
  4. repeatability = repeats / reprojectable.

Usage:
  python tools/repeatability.py [--pairs 12] [--supersample 2] [--psf 0.0]
         [--width 320] [--height 180]
Compares configurations when given a comma list, e.g. --supersample 2,3
--psf 0,0.6 runs the grid.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_repeatability(pairs: int = 12, width: int = 320,
                          height: int = 180, supersample: int = 2,
                          psf_sigma: float = 0.0, radius: float = 1.5,
                          period: int = 288, trajectory: str = "orbit",
                          seed: int = 7, verbose: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from mageslam_tpu.apps.render_scene import (
        CX, CY, FX, FY, build_scene, render_frame, trajectory_pose,
        trajectory_pose_fig8, trajectory_pose_orbit)
    from mageslam_tpu.config import golden_path_settings
    from mageslam_tpu.ops.frontend import detect_and_compute

    traj = {"orbit": trajectory_pose_orbit, "sweep": trajectory_pose,
            "fig8": trajectory_pose_fig8}[trajectory]
    s = golden_path_settings()
    fes = s.MonoSettings.MonoCamera.FeatureExtractorSettings
    sx, sy = width / 640.0, height / 480.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    cam = jnp.array([fx, fy, cx, cy], jnp.float32)
    fe = jax.jit(lambda img: detect_and_compute(
        img.astype(jnp.float32), cam, fes, max_features=512))
    surfaces = build_scene(seed, variant="loop")

    def blur(img, sigma):
        if sigma <= 0:
            return img
        r = int(np.ceil(3 * sigma))
        x = np.arange(-r, r + 1)
        k = np.exp(-0.5 * (x / sigma) ** 2)
        k /= k.sum()
        f = img.astype(np.float32)
        f = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 0, f)
        f = np.apply_along_axis(lambda m: np.convolve(m, k, mode="same"), 1, f)
        return np.clip(f, 0, 255).astype(np.uint8)

    def frame(i):
        R, c = traj(i, period)
        img, dep = render_frame(surfaces, R, c, width, height, frame_index=i,
                                supersample=supersample, return_depth=True)
        img = blur(img, psf_sigma)
        f = fe(jnp.asarray(img))
        xy = np.asarray(f.xy)[np.asarray(f.valid)]
        return xy, dep, R, c

    rates, counts = [], []
    stride = period // pairs
    for p in range(pairs):
        i = p * stride
        xy0, dep0, R0, c0 = frame(i)
        xy1, dep1, R1, c1 = frame(i + 1)
        if len(xy0) == 0 or len(xy1) == 0:
            continue
        # backproject frame-i keypoints through GT depth
        ui = np.clip(xy0[:, 0].round().astype(int), 0, width - 1)
        vi = np.clip(xy0[:, 1].round().astype(int), 0, height - 1)
        z = dep0[vi, ui]
        ok = np.isfinite(z)
        d_cam = np.stack([(xy0[:, 0] - cx) / fx, (xy0[:, 1] - cy) / fy,
                          np.ones(len(xy0))], 1)
        # z here is distance along the RAY; convert to world points
        ray_w = d_cam @ R0                      # R0 is world→camera
        X = c0[None, :] + ray_w * z[:, None]
        # project into frame i+1
        Xc = (X - c1[None, :]) @ R1.T
        ok &= Xc[:, 2] > 0.05
        u1 = fx * Xc[:, 0] / Xc[:, 2] + cx
        v1 = fy * Xc[:, 1] / Xc[:, 2] + cy
        ok &= (u1 >= 0) & (u1 < width) & (v1 >= 0) & (v1 < height)
        # occlusion mask: the reprojected point's ray depth in frame i+1
        # must match the i+1 depth map (else it is behind something)
        uj = np.clip(u1.round().astype(int), 0, width - 1)
        vj = np.clip(v1.round().astype(int), 0, height - 1)
        ray_len1 = np.linalg.norm(X - c1[None, :], axis=1)
        ok &= np.abs(dep1[vj, uj] - ray_len1) < 0.05 * ray_len1
        if ok.sum() == 0:
            continue
        d2 = ((u1[ok, None] - xy1[None, :, 0]) ** 2
              + (v1[ok, None] - xy1[None, :, 1]) ** 2)
        rep = (d2.min(axis=1) <= radius * radius)
        rates.append(rep.mean())
        counts.append(int(ok.sum()))
        if verbose:
            print(f"pair {i:3d}: {rep.sum()}/{ok.sum()} repeated "
                  f"({100 * rep.mean():.0f}%)", file=sys.stderr, flush=True)
    return {
        "repeatability": float(np.mean(rates)) if rates else 0.0,
        "pairs": len(rates),
        "mean_reprojectable": float(np.mean(counts)) if counts else 0.0,
        "supersample": supersample,
        "psf_sigma": psf_sigma,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pairs", type=int, default=12)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--supersample", default="2")
    p.add_argument("--psf", default="0.0")
    p.add_argument("--trajectory", default="orbit")
    args = p.parse_args()
    for ss in [int(x) for x in args.supersample.split(",")]:
        for psf in [float(x) for x in args.psf.split(",")]:
            r = measure_repeatability(
                pairs=args.pairs, width=args.width, height=args.height,
                supersample=ss, psf_sigma=psf, trajectory=args.trajectory,
                verbose=False)
            print(f"supersample={ss} psf={psf}: "
                  f"{100 * r['repeatability']:.1f}% over {r['pairs']} pairs "
                  f"(~{r['mean_reprojectable']:.0f} pts/pair)", flush=True)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
