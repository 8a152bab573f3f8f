"""VOI, cloud denoising, and VI-fuser tests."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.analysis import (
    VoiSettings,
    calculate_volume_of_interest,
    compute_characteristics,
    compute_normals,
    knn,
    make_voi_keyframes,
    mollify_normals,
    reposition_points,
)
from mageslam_tpu.fuser import (
    Fuser,
    FuserMode,
    SampleType,
    SensorSample,
    ekf_init,
    ekf_predict,
    ekf_update_pose,
)
from mageslam_tpu.fuser.filters import GRAVITY, pose_from_state, quat_to_rot
from mageslam_tpu.geometry.se3 import Pose


class TestVoi:
    def test_aabb_covers_view_targets(self):
        # 4 cameras on a ring around origin looking inward from distance 3
        K = 4
        poses_R, poses_t = [], []
        for i in range(K):
            a = 2 * np.pi * i / K
            c = np.array([3 * np.cos(a), 3 * np.sin(a), 0.0], np.float32)
            fwd = -c / np.linalg.norm(c)
            up = np.array([0.0, 0.0, 1.0], np.float32)
            right = np.cross(up, fwd)
            R = np.stack([right, np.cross(fwd, right), fwd])  # world→cam rows
            t = -R @ c
            poses_R.append(R)
            poses_t.append(t)
        poses = Pose(jnp.asarray(np.stack(poses_R)), jnp.asarray(np.stack(poses_t)))
        kf = make_voi_keyframes(
            poses, jnp.full((K,), 2.0), jnp.full((K,), 4.0),
            jnp.ones((K,), bool), VoiSettings())
        lo, hi, ok = calculate_volume_of_interest(kf, VoiSettings())
        assert bool(ok)
        lo, hi = np.array(lo), np.array(hi)
        # the mutual view target (origin region) is inside the AABB
        assert (lo <= 0).all() and (hi >= 0).all(), (lo, hi)
        # and the volume is bounded (not the whole space)
        assert (hi - lo).max() < 12.0


class TestClouds:
    def test_normals_of_plane(self, rng):
        n = 200
        pts = np.zeros((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-1, 1, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        pts[:, 2] = rng.normal(0, 0.01, n)
        valid = jnp.ones((n,), bool)
        nbr, dist = knn(jnp.asarray(pts), valid, 8)
        normals = compute_normals(jnp.asarray(pts), valid, nbr)
        nz = np.abs(np.array(normals)[:, 2])
        assert (nz > 0.95).mean() > 0.9

    def test_mollify_aligns_normals(self, rng):
        n = 100
        pts = jnp.asarray(rng.uniform(-0.1, 0.1, (n, 3)).astype(np.float32))
        normals = np.tile(np.array([0, 0, 1.0], np.float32), (n, 1))
        normals[::7] = [1.0, 0, 0]   # outliers
        out = mollify_normals(pts, jnp.asarray(normals), jnp.ones((n,), bool),
                              normal_scale=1.0, spatial_scale=1.0)
        assert float(jnp.mean(out[:, 2])) > 0.8

    def test_reposition_reduces_plane_noise(self, rng):
        n = 300
        pts = np.zeros((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-1, 1, n)
        pts[:, 1] = rng.uniform(-1, 1, n)
        pts[:, 2] = rng.normal(0, 0.05, n)
        out = reposition_points(jnp.asarray(pts), jnp.ones((n,), bool),
                                sigma_s=0.3, steps=3, k=12)
        before = np.abs(pts[:, 2]).mean()
        after = np.abs(np.array(out)[:, 2]).mean()
        assert after < before * 0.6, (before, after)

    def test_characteristics_shapes(self, rng):
        n = 64
        pts = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
        valid = jnp.ones((n,), bool)
        nbr, dist = knn(pts, valid, 6)
        normals = compute_normals(pts, valid, nbr)
        e, d, h = compute_characteristics(pts, normals, valid, nbr, dist)
        assert e.shape == d.shape == h.shape == (n,)
        assert bool(jnp.all(jnp.isfinite(e)))


class TestEkf:
    def test_static_propagation_stays_put(self):
        st = ekf_init()
        gyro = jnp.zeros(3)
        accel = jnp.array([0.0, 0.0, GRAVITY])   # measures -g when static
        for _ in range(100):
            st = ekf_predict(st, gyro, accel, jnp.float32(0.01))
        assert float(jnp.linalg.norm(st.p)) < 1e-3
        assert float(jnp.linalg.norm(st.v)) < 1e-3

    def test_visual_updates_pull_position(self):
        st = ekf_init()
        target = Pose(jnp.eye(3), jnp.array([-1.0, 0.0, 0.0]))  # center (1,0,0)
        for _ in range(20):
            st = ekf_update_pose(st, target)
        assert abs(float(st.p[0]) - 1.0) < 0.05
        prior = pose_from_state(st)
        np.testing.assert_allclose(np.array(prior.center()),
                                   [1.0, 0.0, 0.0], atol=0.05)

    def test_fuser_mode_machine(self):
        f = Fuser(scale_window=3)
        assert f.mode == FuserMode.WAIT_FOR_MAGE_INIT
        f.on_mage_initialized()
        assert f.mode == FuserMode.WAIT_FOR_GRAVITY
        # static accel samples → gravity converges
        t = 0.0
        for i in range(60):
            t += 0.01
            f.add_sample(SensorSample(SampleType.ACCELEROMETER, t,
                                      np.array([0, 0, GRAVITY], np.float32)))
            if i % 10 == 9:
                f.process_frame(None, t)
            if f.mode != FuserMode.WAIT_FOR_GRAVITY:
                break
        assert f.mode == FuserMode.SCALE_INIT
        # moving visual poses with a PHYSICALLY CONSISTENT IMU: constant
        # +1 m/s² along +x from rest, so the specific force is
        # (1, 0, G) and the camera center follows c(τ) = ½τ² — the scale
        # estimate must come out ≈ 1 (visual poses are metric here). The
        # earlier form moved the camera against a static-gravity IMU; its
        # scale was degenerate (~0) and pose_prior now correctly refuses
        # to divide by it.
        for k in range(6):
            t += 0.1
            f.add_sample(SensorSample(SampleType.GYROMETER, t - 0.05,
                                      np.zeros(3, np.float32)))
            f.add_sample(SensorSample(SampleType.ACCELEROMETER, t - 0.05,
                                      np.array([1.0, 0, GRAVITY], np.float32)))
            tau = 0.1 * (k + 1)
            c = np.array([0.5 * tau * tau, 0.0, 0.0], np.float32)
            pose = Pose(jnp.eye(3), jnp.asarray(-c))
            f.process_frame(pose, t)
        assert f.mode == FuserMode.TRACKING
        assert f.metric_scale is not None
        assert 0.2 < f.metric_scale < 5.0, f.metric_scale
        assert f.pose_prior() is not None


class TestVISession:
    def test_session_with_fuser_tracks(self, rng):
        """UseFuser=true: IMU samples feed the fuser; the session tracks and
        the fuser walks its mode machine off the visual updates."""
        import dataclasses
        import numpy as np
        from mageslam_tpu.config import golden_path_settings
        from mageslam_tpu.runtime import SlamSession, TrackingState
        from test_pipeline import CAM, W, H, frame_features, make_world, pose_at

        s = golden_path_settings()
        s = dataclasses.replace(
            s, FuserSettings=dataclasses.replace(s.FuserSettings, UseFuser=True))
        pts, descs = make_world(rng)
        sess = SlamSession(s, cam=CAM, image_width=int(W), image_height=int(H))
        assert sess.fuser is not None
        for i in range(30):
            t = i * 0.033
            # 3 IMU samples per frame (static-ish dummy data)
            for k in range(3):
                ts = t - 0.022 + 0.011 * k
                sess.add_sensor_sample(SensorSample(
                    SampleType.GYROMETER, ts, np.zeros(3, np.float32)))
                sess.add_sensor_sample(SensorSample(
                    SampleType.ACCELEROMETER, ts,
                    np.array([0, 0, GRAVITY], np.float32)))
            sess.process_features(
                frame_features(pts, descs, pose_at(t), sess.N, rng), t, i)
        assert sess.initialized
        tracked = sum(r.state == TrackingState.TRACKING for r in sess.results)
        assert tracked >= 10
        # fuser advanced beyond waiting-for-init
        assert sess.fuser.mode != FuserMode.WAIT_FOR_MAGE_INIT


class TestPoseCovariance:
    """Fuser::EstimatePoseCovariance parity (Fuser.h:51-75): Gauss-Newton
    covariance from reprojection Jacobians."""

    def _setup(self, rng, n=60, noise=0.5):
        import jax.numpy as jnp
        from mageslam_tpu.fuser.covariance import estimate_pose_covariance
        pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                        rng.uniform(3, 8, n)], 1).astype(np.float32)
        cam = jnp.array([260.0, 260.0, 160.0, 90.0])
        pose = Pose(jnp.eye(3), jnp.zeros(3))
        uv = np.stack([260 * pts[:, 0] / pts[:, 2] + 160,
                       260 * pts[:, 1] / pts[:, 2] + 90], 1).astype(np.float32)
        uv += rng.normal(0, noise, uv.shape).astype(np.float32)
        N = 64
        kp = np.zeros((N, 2), np.float32); kp[:n] = uv[:N]
        valid = np.arange(N) < n
        assoc = np.where(valid, np.arange(N), -1).astype(np.int32)
        return (estimate_pose_covariance, pose, cam, jnp.asarray(kp),
                jnp.asarray(valid), jnp.asarray(assoc),
                jnp.asarray(pts), jnp.ones((n,), bool))

    def test_covariance_shrinks_with_more_points(self, rng):
        import jax.numpy as jnp
        f, pose, cam, kp, valid, assoc, mp, mpv = self._setup(rng, n=60)
        cov_many, ok = f(pose, cam, kp, valid, assoc, mp, mpv)
        assert bool(ok)
        few = valid & (jnp.arange(valid.shape[0]) < 10)
        cov_few, ok2 = f(pose, cam, kp, few,
                         jnp.where(few, assoc, -1), mp, mpv)
        assert bool(ok2)
        assert float(jnp.trace(cov_many)) < float(jnp.trace(cov_few))
        # symmetric positive definite
        c = np.array(cov_many)
        np.testing.assert_allclose(c, c.T, rtol=1e-6)
        assert (np.linalg.eigvalsh(c) > 0).all()

    def test_underdetermined_fails(self, rng):
        import jax.numpy as jnp
        f, pose, cam, kp, valid, assoc, mp, mpv = self._setup(rng, n=2)
        cov, ok = f(pose, cam, kp, valid, assoc, mp, mpv)
        assert not bool(ok)


class TestFilterSelection:
    """FilterType-driven sensor-filter selection (SensorFilter.h:99-157)."""

    def _converge_gravity(self, f):
        f.on_mage_initialized()
        t = 0.0
        for i in range(120):
            t += 0.01
            f.add_sample(SensorSample(SampleType.ACCELEROMETER, t,
                                      np.array([0, 0, GRAVITY], np.float32)))
            if i % 10 == 9:
                f.process_frame(None, t)
            if f.mode != FuserMode.WAIT_FOR_GRAVITY:
                break
        return t

    def test_3dof_skips_scale_and_updates_rotation_only(self):
        from mageslam_tpu.config import FilterType
        f = Fuser(filter_type=FilterType.FUSER3DOF)
        t = self._converge_gravity(f)
        # 3DoF: straight to TRACKING, never SCALE_INIT
        assert f.mode == FuserMode.TRACKING
        p_before = np.array(f.state.p)
        for k in range(5):
            t += 0.1
            pose = Pose(jnp.eye(3), jnp.array([-0.3 * k, 0.0, 0.0]))
            f.process_frame(pose, t)
        # position states untouched by rotation-only updates
        np.testing.assert_allclose(np.array(f.state.p), p_before, atol=1e-9)
        assert f.metric_scale is None
        prior = f.pose_prior()
        assert prior is not None
        # prior carries the last visual center as translation
        np.testing.assert_allclose(np.array(prior.center()),
                                   [1.2, 0.0, 0.0], atol=1e-5)

    def test_simple6dof_freezes_biases(self):
        from mageslam_tpu.config import FilterType
        f = Fuser(filter_type=FilterType.SIMPLE6DOF, scale_window=3)
        t = self._converge_gravity(f)
        assert f.mode == FuserMode.SCALE_INIT
        for k in range(6):
            t += 0.1
            f.add_sample(SensorSample(SampleType.GYROMETER, t - 0.05,
                                      np.full(3, 0.01, np.float32)))
            f.add_sample(SensorSample(
                SampleType.ACCELEROMETER, t - 0.05,
                np.array([0.05, 0, GRAVITY], np.float32)))
            pose = Pose(jnp.eye(3), jnp.array([-0.1 * k, 0.0, 0.0]))
            f.process_frame(pose, t)
        np.testing.assert_allclose(np.array(f.state.bg), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.array(f.state.ba), 0.0, atol=1e-12)

    def test_covariance_weighted_update(self):
        """A huge measurement covariance must damp the visual update."""
        from mageslam_tpu.fuser.filters import ekf_init, ekf_update_pose
        target = Pose(jnp.eye(3), jnp.array([-1.0, 0.0, 0.0]))
        st_default = ekf_update_pose(ekf_init(), target)
        st_weak = ekf_update_pose(ekf_init(), target,
                                  pose_cov=jnp.eye(6) * 1e4)
        assert float(st_weak.p[0]) < float(st_default.p[0]) * 0.1
