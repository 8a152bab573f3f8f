"""Console golden path: video / capture / TUM sequence → trajectory CSV.

Replaces Apps/Console/console.cpp (341 LoC): the reference reads an MP4 with
OpenCV, feeds grayscale 320×180 frames through MAGESlam::ProcessFrame
synchronously, then Fossilizes and writes a CSV of 4×4 poses for the
Babylon.js visualizer (console.cpp:15-54, 291-341). This CLI supports three
inputs:

  - an .mgts capture (mageslam_tpu.io format; decoded by the native C++
    prefetching loader when built, Python fallback otherwise)
  - a video file (cv2.VideoCapture, like the reference)
  - a TUM RGB-D sequence directory (rgb.txt timestamps — the evaluation
    format for the ATE parity target, BASELINE.md)

Usage: python -m mageslam_tpu.apps.console INPUT -o out.csv [--settings s.json]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import numpy as np


def iter_capture(path: str, width: int, height: int):
    from ..io.native_loader import NativeFrameLoader, native_available

    if native_available():
        loader = NativeFrameLoader(path, width, height)
        yield from loader.frames()
        loader.close()
        return
    from ..io.capture import CaptureReader

    with CaptureReader(path) as r:
        for px, ts, fid in r.frames():
            yield _resize(px, width, height), ts, fid


def iter_video(path: str, width: int, height: int):
    import cv2

    cap = cv2.VideoCapture(path)
    fid = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        gray = cv2.resize(gray, (width, height))
        # synthetic 33 ms timestamps, like console.cpp:327
        yield gray, fid * (1.0 / 30.0), fid
        fid += 1
    cap.release()


def iter_tum(directory: str, width: int, height: int):
    import cv2

    rgb_txt = os.path.join(directory, "rgb.txt")
    fid = 0
    with open(rgb_txt) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            ts_str, rel = line.split()[:2]
            img = cv2.imread(os.path.join(directory, rel), cv2.IMREAD_GRAYSCALE)
            if img is None:
                continue
            img = cv2.resize(img, (width, height))
            yield img, float(ts_str), fid
            fid += 1


def _resize(px: np.ndarray, w: int, h: int) -> np.ndarray:
    if px.shape == (h, w):
        return px
    ys = (np.arange(h) * px.shape[0] / h).astype(np.int32)
    xs = (np.arange(w) * px.shape[1] / w).astype(np.int32)
    return px[ys][:, xs]


def write_pose_csv(path: str, frame_ids, mats, timestamps=None) -> None:
    """4×4 world matrices as CSV rows (the fossil visualizer format:
    console.cpp:15-54 writes inverse-view a.k.a. world matrices row-major)."""
    with open(path, "w") as f:
        for i, fid in enumerate(frame_ids):
            world = np.linalg.inv(mats[i])       # view → world matrix
            row = [str(fid)] + [f"{v:.9g}" for v in world.reshape(-1)]
            if timestamps is not None:
                row.insert(1, f"{timestamps[i]:.9f}")
            f.write(",".join(row) + "\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help=".mgts capture, video file, or TUM directory")
    p.add_argument("-o", "--output", default="trajectory.csv")
    p.add_argument("--settings", default=None, help="settings JSON")
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--fx", type=float, default=None)
    p.add_argument("--fy", type=float, default=None)
    p.add_argument("--cx", type=float, default=None)
    p.add_argument("--cy", type=float, default=None)
    p.add_argument("--max-frames", type=int, default=0)
    p.add_argument("--global-ba-steps", type=int, default=None)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..config import golden_path_settings, load_settings
    from ..runtime import SlamSession, TrackingState

    settings = load_settings(args.settings) if args.settings else golden_path_settings()

    # camera defaults: TUM fr1 intrinsics scaled to the tracking resolution
    sx = args.width / 640.0
    sy = args.height / 480.0
    cam = jnp.array([
        args.fx if args.fx is not None else 517.3 * sx,
        args.fy if args.fy is not None else 516.5 * sy,
        args.cx if args.cx is not None else 318.6 * sx,
        args.cy if args.cy is not None else 255.3 * sy,
    ], jnp.float32)

    if os.path.isdir(args.input):
        frames = iter_tum(args.input, args.width, args.height)
    elif args.input.endswith(".mgts"):
        frames = iter_capture(args.input, args.width, args.height)
    else:
        frames = iter_video(args.input, args.width, args.height)

    sess = SlamSession(settings, cam=cam, image_width=args.width,
                       image_height=args.height)
    t0 = time.perf_counter()
    n = tracked = 0
    ts_by_id = {}
    for px, ts, fid in frames:
        ts_by_id[fid] = ts
        r = sess.process_frame(px.astype(np.float32), ts, fid)
        tracked += r.state == TrackingState.TRACKING
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    elapsed = time.perf_counter() - t0

    ids, mats = sess.fossilize(args.global_ba_steps)
    write_pose_csv(args.output, ids, mats,
                   [ts_by_id.get(int(i), 0.0) for i in ids])
    print(f"frames={n} tracked={tracked} fps={n / max(elapsed, 1e-9):.1f} "
          f"poses={len(ids)} -> {args.output}")
    return 0 if tracked > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
