"""The Fuser: VI mode state machine, gravity convergence, metric scale.

Replaces Fuser/Fuser.{h,cpp} (870 LoC, excluded from the reference build —
FuserStubs.cpp throws on every call) and Tasks/FuserWorker.cpp:37-80's mode
machine:

  WAIT_FOR_MAGE_INIT      — visual map not yet initialized
  WAIT_FOR_GRAVITY        — run 3DoF gravity updates until attitude converges
  SCALE_INIT              — accumulate (visual Δp, inertially-integrated Δp)
                            pairs; metric scale = ratio of path lengths
  TRACKING                — full 6DoF EKF: IMU propagation between frames,
                            visual pose updates at frames; provides pose
                            priors (IMUPosePriorProvider equivalent)

The golden path runs UseFuser=false with the constant-velocity motion model
(MotionModelPriorProvider); this Fuser is the UseFuser=true path.
"""

from __future__ import annotations

import enum

import numpy as np
import jax.numpy as jnp

from ..geometry.se3 import Pose
from .filters import (
    ekf_init,
    ekf_predict,
    ekf_update_gravity,
    ekf_update_pose,
    ekf_update_rotation,
    pose_from_state,
)
from .sample_queue import SampleQueue, SampleType, SensorSample


class FuserMode(enum.Enum):
    WAIT_FOR_MAGE_INIT = 0
    WAIT_FOR_GRAVITY = 1
    SCALE_INIT = 2
    TRACKING = 3


class Fuser:
    def __init__(self, gravity_converge_var: float = 1e-3,
                 scale_window: int = 10, filter_type=None):
        """filter_type selects the sensor filter (config.FilterType ↔
        SensorFilter3Dof/6Dof/Simple6Dof, SensorFilter.h:99-157):
          FUSER3DOF  — attitude-only: gravity + visual ROTATION updates, no
                       scale estimation, rotation-only priors
          FUSER6DOF  — the full error-state EKF (default)
          SIMPLE6DOF — 6DoF propagation with the IMU bias states frozen
                       (the internal SimpleIMUFilter's reduced model)
        """
        from ..config import FilterType

        self.queue = SampleQueue()
        self.state = ekf_init()
        self.mode = FuserMode.WAIT_FOR_MAGE_INIT
        self.gravity_converge_var = gravity_converge_var
        self.scale_window = scale_window
        self.filter_type = (FilterType.FUSER6DOF if filter_type is None
                            else filter_type)
        self._scale_pairs: list = []        # (Δc_visual (3,), Δp_imu (3,), dt)
        self.metric_scale: float | None = None
        self._last_time: float | None = None
        self._last_visual_center: np.ndarray | None = None
        self._last_scale_time: float | None = None
        self._imu_delta = np.zeros(3)

    # -- events (the mediator messages of FuserWorker) -------------------- #
    def on_mage_initialized(self) -> None:
        if self.mode == FuserMode.WAIT_FOR_MAGE_INIT:
            self.mode = FuserMode.WAIT_FOR_GRAVITY

    def add_sample(self, sample: SensorSample) -> None:
        self.queue.add(sample)

    # -- per-frame processing -------------------------------------------- #
    def process_frame(self, visual_pose: Pose | None, timestamp: float,
                      pose_covariance=None) -> None:
        """Consume inertial samples up to this frame's fence, then apply the
        visual update according to the current mode. `pose_covariance` is
        the optional (6, 6) reprojection-derived covariance in [rho, phi]
        order (fuser.covariance ↔ Fuser::EstimatePoseCovariance) weighting
        the visual update."""
        from ..config import FilterType

        self.queue.add_image_fence(timestamp)
        samples, fence = self.queue.drain_until_fence()

        gyro = np.zeros(3, np.float32)
        for s in samples:
            if s.type == SampleType.GYROMETER:
                # latest angular rate, consumed by the next accel-driven
                # integration step — gyro samples do NOT advance the
                # integration clock (a gyro+accel pair sharing one hardware
                # timestamp must still integrate over the full sample
                # period; keying dt off "previous sample of any type" made
                # paired streams integrate over dt=0 and froze the filter
                # position — caught by the end-to-end VI run, vi_eval.py)
                gyro = np.asarray(s.data, np.float32)
            elif s.type == SampleType.ACCELEROMETER:
                dt = 0.0 if self._last_time is None else max(s.timestamp - self._last_time, 0.0)
                self._last_time = s.timestamp
                accel = np.asarray(s.data, np.float32)
                if dt > 0 and self.mode in (FuserMode.SCALE_INIT, FuserMode.TRACKING):
                    self.state = ekf_predict(
                        self.state, jnp.asarray(gyro), jnp.asarray(accel),
                        jnp.float32(dt))
                    if self.filter_type == FilterType.SIMPLE6DOF:
                        # SimpleIMUFilter: no online bias estimation
                        self.state = self.state._replace(
                            bg=jnp.zeros(3), ba=jnp.zeros(3))
                if self.mode == FuserMode.WAIT_FOR_GRAVITY:
                    self.state = ekf_update_gravity(self.state, jnp.asarray(accel))

        if self.mode == FuserMode.WAIT_FOR_GRAVITY:
            # yaw is unobservable from gravity — converge on the two
            # observable attitude axes (smallest covariance eigenvalues)
            eig = np.sort(np.linalg.eigvalsh(np.asarray(self.state.P[0:3, 0:3])))
            if float(eig[0] + eig[1]) < self.gravity_converge_var:
                # 3DoF mode never estimates metric scale — it provides
                # rotation-only fusion (SensorFilter3Dof)
                if self.filter_type == FilterType.FUSER3DOF:
                    self.mode = FuserMode.TRACKING
                else:
                    self.mode = FuserMode.SCALE_INIT
            return

        if visual_pose is None:
            return

        cov = None if pose_covariance is None else jnp.asarray(pose_covariance)
        if self.filter_type == FilterType.FUSER3DOF:
            if self.mode == FuserMode.TRACKING:
                rot_cov = None if cov is None else cov[3:, 3:]
                self.state = ekf_update_rotation(self.state, visual_pose,
                                                 rot_cov=rot_cov)
                self._last_visual_center = np.asarray(visual_pose.center())
            return

        center = np.asarray(visual_pose.center())
        if self.mode == FuserMode.SCALE_INIT:
            # visual ROTATION update during scale init: attitude from vision
            # is scale-free, and an uncorrected attitude error from gravity
            # convergence (~1-2°) leaks g·sinθ ≈ 0.2-0.3 m/s² into the
            # velocity integral — the dominant scale-estimate error
            # (measured on the synthetic-IMU sweep: scale 0.16 vs true 0.39
            # without this update). Position stays vision-free: it IS the
            # measurement being ratioed.
            self.state = ekf_update_rotation(self.state, visual_pose)
            if self._last_visual_center is not None:
                dc = center - self._last_visual_center      # map units
                dp = np.asarray(self.state.p, np.float64)   # metres, v carried
                dt = (timestamp - self._last_scale_time
                      if self._last_scale_time is not None else 0.0)
                if np.linalg.norm(dc) > 1e-6 and dt > 0:
                    self._scale_pairs.append((dc, dp, dt))
            self._last_visual_center = center
            self._last_scale_time = timestamp
            self.state = self.state._replace(p=jnp.zeros(3))  # re-anchor
            if len(self._scale_pairs) >= self.scale_window:
                # the filter's velocity integrates from v=0 at window start
                # while the camera is already moving, so each per-frame IMU
                # displacement is missing a v₀·dt term — a plain
                # path-length ratio then underestimates the scale ~2×
                # (measured). Solve jointly for scale s and the unknown
                # initial velocity v₀:  s·Δc_k − v₀·dt_k = Δp_k
                # (VI bootstrap in the VINS-style linear-alignment family).
                A = np.concatenate(
                    [np.concatenate(
                        [dc[:, None], -dt * np.eye(3)], axis=1)
                     for dc, _, dt in self._scale_pairs])        # (3n, 4)
                b = np.concatenate([dp for _, dp, _ in self._scale_pairs])
                x, *_ = np.linalg.lstsq(A, b, rcond=None)
                self.metric_scale = float(max(x[0], 1e-12))
                self.mode = FuserMode.TRACKING
            return

        if self.mode == FuserMode.TRACKING:
            # scale the visual pose into metric units before the EKF update
            s = self.metric_scale or 1.0
            metric = Pose(visual_pose.R, visual_pose.t * s)
            metric_cov = None
            if cov is not None:
                metric_cov = cov.at[:3, :].mul(s).at[:, :3].mul(s)
            self.state = ekf_update_pose(self.state, metric,
                                         pose_cov=metric_cov)
            if self.filter_type == FilterType.SIMPLE6DOF:
                # SimpleIMUFilter: biases frozen against UPDATE injection
                # too, not just predict (the Kalman gain's bias rows are
                # nonzero once propagation has built cross-covariances)
                self.state = self.state._replace(
                    bg=jnp.zeros(3), ba=jnp.zeros(3))

    # -- outputs ---------------------------------------------------------- #
    def pose_prior(self) -> Pose | None:
        """IMU-predicted pose prior in VISUAL map units (IMUPosePriorProvider).
        In 3DoF mode the prior is rotation-only (position held at the last
        visual center — the caller's motion model supplies translation)."""
        from ..config import FilterType

        if self.mode != FuserMode.TRACKING:
            return None
        if self.filter_type == FilterType.FUSER3DOF:
            metric = pose_from_state(self.state)
            c = (self._last_visual_center if self._last_visual_center
                 is not None else np.zeros(3))
            t = -metric.R @ jnp.asarray(c, jnp.float32)
            return Pose(metric.R, t)
        if self.metric_scale is None or self.metric_scale < 1e-6:
            # degenerate scale estimate (e.g. a stationary SCALE_INIT
            # window) — a prior divided by it would be garbage; fall back
            # to the caller's motion model
            return None
        metric = pose_from_state(self.state)
        inv_s = 1.0 / self.metric_scale
        return Pose(metric.R, metric.t * inv_s)
