"""Visual-inertial end-to-end evaluation: the UseFuser=true path on rendered
pixels with a synthesized IMU stream (VERDICT r4 #6).

The reference's fuser binaries are stubbed (FuserStubs.cpp throws), so the
capability bar is the architecture running end to end: sensor samples
through MAGESlam::AddSensorSample ↔ SlamSession.add_sensor_sample, the
FuserWorker mode machine (Tasks/FuserWorker.cpp:37-80 —
WaitForGravityConverge → ScaleInit → Tracking), metric-scale estimation,
and IMU pose priors feeding tracking (IMUPosePriorProvider).

IMU synthesis (exact differentiation of the analytic ground-truth
trajectory by central differences at sub-frame step):
  gyro  = body angular rate:  vee(R_wbᵀ · dR_wb/dt)            + bias + noise
  accel = specific force:     R_wbᵀ · (d²c/dt² − g_world)      + bias + noise
Gravity convention: the error-state EKF's world is z-up (filters.py
GRAVITY, g_world = (0, 0, −G)); the synthetic IMU therefore defines
"down" as +z in the render world. The sweep/orbit trajectories start at
R = I, so the monocular map frame (first camera = gauge origin) coincides
with the render world orientation and the visual updates are consistent
with the gravity updates without a map↔IMU alignment stage (the
reference's frame handling: Fuser.h:34-75 world documents).

Usage: python -m mageslam_tpu.apps.vi_eval [--frames 80] [--imu-rate 120]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..fuser.filters import GRAVITY
from ..fuser.sample_queue import SampleType, SensorSample

FPS = 30.0


def _vee(A: np.ndarray) -> np.ndarray:
    return 0.5 * np.array([A[2, 1] - A[1, 2], A[0, 2] - A[2, 0],
                           A[1, 0] - A[0, 1]], np.float64)


def synthesize_imu(traj_fn, n_frames: int, period: int,
                   imu_rate: float = 120.0, seed: int = 3,
                   gyro_noise: float = 0.002, accel_noise: float = 0.02,
                   gyro_bias: float = 0.003, accel_bias: float = 0.03):
    """Gyro/accel SensorSamples along the analytic trajectory, with constant
    biases and white noise (device/presets.py IMU characterization scale).
    traj_fn(i, period) -> (R_cw, c) accepts float frame indices."""
    rng = np.random.default_rng(seed)
    bg = rng.normal(0.0, gyro_bias, 3)
    ba = rng.normal(0.0, accel_bias, 3)
    g_world = np.array([0.0, 0.0, -GRAVITY])
    h = 0.05                                  # frames; central-difference step
    samples = []
    n_samples = int(n_frames * imu_rate / FPS)
    for k in range(n_samples):
        ts = k / imu_rate
        i = ts * FPS
        R0, c0 = traj_fn(i, period)
        Rp, cp = traj_fn(i + h, period)
        Rm, cm = traj_fn(i - h, period)
        R_wb = R0.astype(np.float64).T        # body→world (camera ≡ body)
        dR_wb = (Rp.T - Rm.T).astype(np.float64) / (2 * h) * FPS
        omega = _vee(R_wb.T @ dR_wb)
        a_world = (cp - 2.0 * c0 + cm).astype(np.float64) / (h * h) * FPS * FPS
        f_body = R_wb.T @ (a_world - g_world)
        samples.append(SensorSample(
            SampleType.GYROMETER, ts,
            (omega + bg + rng.normal(0, gyro_noise, 3)).astype(np.float32)))
        samples.append(SensorSample(
            SampleType.ACCELEROMETER, ts,
            (f_body + ba + rng.normal(0, accel_noise, 3)).astype(np.float32)))
    return samples


def run_vi_eval(n_frames: int = 80, width: int = 320, height: int = 180,
                trajectory: str = "sweep", period: int | None = None,
                imu_rate: float = 120.0, filter_type=None,
                verbose: bool = True, settings=None):
    """Render `trajectory`, interleave the synthesized IMU stream with the
    frames through the public session API, and return mode-transition
    frames, the metric-scale estimate + its ground truth, tracking health
    and ATE RMSE."""
    import jax.numpy as jnp
    import dataclasses

    from ..config import FilterType, golden_path_settings
    from ..fuser.fuser import FuserMode
    from ..runtime import SlamSession, TrackingState
    from .evaluate import ate_rmse
    from .render_scene import (CX, CY, FX, FY, render_sequence,
                               trajectory_pose, trajectory_pose_circuit,
                               trajectory_pose_fig8, trajectory_pose_orbit)

    period = period or n_frames
    ft = FilterType.SIMPLE6DOF if filter_type is None else filter_type
    s = settings if settings is not None else golden_path_settings()
    s = dataclasses.replace(
        s, FuserSettings=dataclasses.replace(
            s.FuserSettings, UseFuser=True, FilterType=ft))
    sx, sy = width / 640.0, height / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    sess = SlamSession(s, cam=cam, image_width=width, image_height=height)

    traj_fn = {"sweep": trajectory_pose, "orbit": trajectory_pose_orbit,
               "circuit": trajectory_pose_circuit,
               "fig8": trajectory_pose_fig8}[trajectory]
    imu = synthesize_imu(traj_fn, n_frames, period, imu_rate=imu_rate)
    imu_iter = iter(imu)
    next_s = next(imu_iter, None)

    t0 = time.time()
    gt_ts, gt_c, ts_by_id = [], [], {}
    transitions = {}
    prev_mode = sess.fuser.mode
    for img, ts, fid, _R, c in render_sequence(
            n_frames, width, height, trajectory=trajectory, period=period):
        # deliver every sensor sample timestamped before this frame — the
        # image-fence ordering AddSensorSample relies on (sample_queue.py)
        while next_s is not None and next_s.timestamp <= ts:
            sess.add_sensor_sample(next_s)
            next_s = next(imu_iter, None)
        sess.process_frame(img.astype(np.float32), ts, fid)
        gt_ts.append(ts)
        gt_c.append(c)
        ts_by_id[fid] = ts
        if sess.fuser.mode != prev_mode:
            transitions[sess.fuser.mode.name] = fid
            prev_mode = sess.fuser.mode
            if verbose:
                print(f"f{fid:3d} fuser → {prev_mode.name}"
                      f" ({time.time() - t0:.0f}s)", file=sys.stderr)

    ids, mats = sess.fossilize(global_ba_steps=None)
    states = [r.state for r in sorted(sess.results, key=lambda r: r.frame_id)]
    est_ts = np.array([ts_by_id[int(i)] for i in ids])
    est_c = np.array([-m[:3, :3].T @ m[:3, 3] for m in mats])
    rmse, n = ate_rmse(est_ts, est_c, np.array(gt_ts), np.array(gt_c))

    # ground-truth metric scale = metric path length / visual path length
    # over the frames the session actually estimated (the mono gauge is the
    # init baseline; the fuser's SCALE_INIT estimates exactly this ratio)
    id_to_gt = {fid: c for fid, c in zip(ts_by_id, gt_c)}
    gt_seq = np.array([id_to_gt[int(i)] for i in ids])
    gt_path = float(np.linalg.norm(np.diff(gt_seq, axis=0), axis=1).sum())
    est_path = float(np.linalg.norm(np.diff(est_c, axis=0), axis=1).sum())
    scale_true = gt_path / max(est_path, 1e-12)

    return {
        "n_frames": n_frames,
        "tracked": sum(st == TrackingState.TRACKING for st in states),
        "transitions": transitions,
        "final_mode": sess.fuser.mode.name,
        "metric_scale": sess.fuser.metric_scale,
        "scale_true": scale_true,
        "ate_rmse": float(rmse),
        "n_poses": int(n),
        "keyframes": int(np.asarray(sess.map.kf_valid).sum()),
        "elapsed_s": time.time() - t0,
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=80)
    p.add_argument("--trajectory", default="sweep",
                   choices=["sweep", "orbit", "circuit", "fig8"])
    p.add_argument("--period", type=int, default=None)
    p.add_argument("--imu-rate", type=float, default=120.0)
    p.add_argument("--filter", default="simple6dof",
                   choices=["3dof", "6dof", "simple6dof"])
    args = p.parse_args()
    from ..config import FilterType

    ft = {"3dof": FilterType.FUSER3DOF, "6dof": FilterType.FUSER6DOF,
          "simple6dof": FilterType.SIMPLE6DOF}[args.filter]
    r = run_vi_eval(args.frames, trajectory=args.trajectory,
                    period=args.period, imu_rate=args.imu_rate,
                    filter_type=ft)
    print(f"tracked {r['tracked']}/{r['n_frames']}  "
          f"transitions {r['transitions']}  final {r['final_mode']}  "
          f"scale {r['metric_scale']} (true {r['scale_true']:.3f})  "
          f"ATE {r['ate_rmse']:.4f} m / {r['n_poses']} poses  "
          f"({r['elapsed_s']:.0f}s)")


if __name__ == "__main__":
    main()
