"""End-to-end pipeline test: a SlamSession over a synthetic feature stream.

A virtual camera translates through a 3D point field; each frame's features
are the projected points with fixed per-point descriptors (the frontend is
oracle-tested separately in test_frontend.py). The session must initialize,
track every frame, insert keyframes, grow the map, and produce a trajectory
matching ground truth up to the monocular scale gauge."""

import numpy as np
import jax.numpy as jnp
import pytest

from mageslam_tpu.config import golden_path_settings
from mageslam_tpu.geometry.se3 import Pose
from mageslam_tpu.ops.frontend import FrameFeatures
from mageslam_tpu.runtime import SlamSession, TrackingState

W, H = 320.0, 180.0
CAM = jnp.array([260.0, 260.0, 160.0, 90.0])


def make_world(rng, n=400):
    pts = np.stack([
        rng.uniform(-4, 4, n), rng.uniform(-2.5, 2.5, n), rng.uniform(3, 10, n),
    ], 1).astype(np.float32)
    descs = rng.randint(0, 2**31, (n, 8)).astype(np.uint32)
    return pts, descs


def pose_at(t):
    """Camera translating along +x with slight y wobble, looking at +z."""
    c = np.array([0.9 * t, 0.06 * np.sin(2 * t), 0.0], np.float32)
    return Pose(jnp.eye(3), jnp.array(-c))


def frame_features(pts, descs, pose, n_slots, rng, noise=0.2):
    Xc = np.array(pose.transform(jnp.array(pts)))
    z = Xc[:, 2]
    uv = np.stack([
        float(CAM[0]) * Xc[:, 0] / z + float(CAM[2]),
        float(CAM[1]) * Xc[:, 1] / z + float(CAM[3]),
    ], 1).astype(np.float32)
    vis = (z > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < W - 10) \
        & (uv[:, 1] > 10) & (uv[:, 1] < H - 10)
    idx = np.where(vis)[0][:n_slots]
    n = len(idx)
    xy = np.full((n_slots, 2), -1e6, np.float32)
    xy[:n] = uv[idx] + rng.normal(0, noise, (n, 2)).astype(np.float32)
    d = np.zeros((n_slots, 8), np.uint32)
    d[:n] = descs[idx]
    valid = np.arange(n_slots) < n
    return FrameFeatures(
        xy=jnp.asarray(xy), und_xy=jnp.asarray(xy),
        response=jnp.where(jnp.asarray(valid), 10.0, 0.0),
        octave=jnp.zeros((n_slots,), jnp.int32),
        angle=jnp.zeros((n_slots,), jnp.float32),
        desc=jnp.asarray(d), valid=jnp.asarray(valid),
    )


@pytest.fixture(scope="module")
def session_run():
    rng = np.random.RandomState(42)
    pts, descs = make_world(rng)
    settings = golden_path_settings()
    sess = SlamSession(settings, cam=CAM, image_width=int(W), image_height=int(H))
    true_centers = []
    n_frames = 40
    for i in range(n_frames):
        t = i * 0.033
        pose = pose_at(t * 1.0)
        feats = frame_features(pts, descs, pose, sess.N, rng)
        sess.process_features(feats, t, i)
        true_centers.append(np.array(pose.center()))
    return sess, np.array(true_centers)


class TestPipeline:
    def test_initializes_and_tracks(self, session_run):
        sess, _ = session_run
        states = [r.state for r in sess.results]
        assert sess.initialized
        # the median-depth parallax gate (MaxParallax3dMedianDistance=20) needs
        # baseline ≥ ~5% of median depth → ~0.45 units of travel ≈ frame 14 here
        first_track = next(i for i, s in enumerate(states) if s == TrackingState.TRACKING)
        assert first_track < 18, f"slow init: {states[:18]}"
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= len(states) - first_track - 2, states

    def test_keyframes_and_map_grow(self, session_run):
        sess, _ = session_run
        n_kf = int(jnp.sum(sess.map.kf_valid))
        n_mp = int(jnp.sum(sess.map.mp_valid))
        assert n_kf >= 2
        assert n_mp >= 60
        kfs = [r for r in sess.results if r.is_keyframe]
        assert len(kfs) >= 1

    def test_trajectory_matches_ground_truth(self, session_run):
        sess, true_centers = session_run
        ids, mats = sess.fossilize(global_ba_steps=0)
        assert len(ids) >= 25
        est_centers = np.array([-m[:3, :3].T @ m[:3, 3] for m in mats])
        gt = true_centers[ids]
        # align scale (monocular gauge): least-squares scale on centered tracks
        est_c = est_centers - est_centers[0]
        gt_c = gt - gt[0]
        scale = np.sum(est_c * gt_c) / max(np.sum(est_c * est_c), 1e-12)
        err = np.linalg.norm(est_c * scale - gt_c, axis=1)
        rmse = np.sqrt((err ** 2).mean())
        # ~2.4 units of total travel; ATE under 5%
        assert rmse < 0.12, f"ATE RMSE {rmse}"

    def test_fossilize_with_global_ba(self, session_run):
        sess, true_centers = session_run
        ids, mats = sess.fossilize(global_ba_steps=3)
        assert np.isfinite(mats).all()


class TestMultiLevelPipeline:
    def test_tracks_with_three_pyramid_levels(self, rng):
        """Exercise the octave paths end-to-end (golden path uses 1 level)."""
        import dataclasses

        s = golden_path_settings()
        fes = dataclasses.replace(
            s.MonoSettings.MonoCamera.FeatureExtractorSettings,
            NumLevels=3, ScaleFactor=1.5)
        s = dataclasses.replace(
            s, MonoSettings=dataclasses.replace(
                s.MonoSettings,
                MonoCamera=dataclasses.replace(
                    s.MonoSettings.MonoCamera, FeatureExtractorSettings=fes)))
        rng2 = np.random.RandomState(3)
        pts, descs = make_world(rng2)
        sess = SlamSession(s, cam=CAM, image_width=int(W), image_height=int(H))
        # synthetic features get random octaves in [0, 3)
        for i in range(30):
            t = i * 0.033
            f = frame_features(pts, descs, pose_at(t), sess.N, rng2)
            f = f._replace(octave=jnp.asarray(
                np.random.RandomState(i).randint(0, 3, sess.N), jnp.int32))
            sess.process_features(f, t, i)
        tracked = sum(r.state == TrackingState.TRACKING for r in sess.results)
        assert sess.initialized and tracked >= 10


class TestPipelinedImagePath:
    def test_single_dispatch_frame_loop(self, rng):
        """process_frame_pipelined on rendered images matches sync tracking."""
        import sys
        sys.path.insert(0, ".")
        import bench

        rng2 = np.random.RandomState(7)
        pts, patches = bench.build_world(rng2)
        cam = jnp.array([bench.FX, bench.FY, bench.CX, bench.CY], jnp.float32)
        sess = SlamSession(cam=cam, image_width=bench.W, image_height=bench.H)
        results = []
        for i in range(40):
            img = jnp.asarray(bench.render(pts, patches, i * 0.033))
            r = sess.process_frame_pipelined(img, i * 0.033, i)
            if r is not None:
                results.append(r)
        last = sess.flush()
        if last is not None:
            results.append(last)
        tracked = sum(r.state == TrackingState.TRACKING for r in sess.results)
        assert sess.initialized
        assert tracked >= 25, tracked


class TestChunkedFrameLoop:
    def test_chunked_and_stream_match_per_frame(self, rng):
        """process_frames_chunked / process_frame_stream (C frames per
        compiled dispatch, device-side lax.scan) produce the same poses as
        the per-frame path."""
        import sys
        sys.path.insert(0, ".")
        import bench

        rng2 = np.random.RandomState(7)
        pts, patches = bench.build_world(rng2)
        cam = jnp.array([bench.FX, bench.FY, bench.CX, bench.CY], jnp.float32)
        images = [jnp.asarray(bench.render(pts, patches, i * 0.033))
                  for i in range(52)]

        def warm(sess):
            for i in range(40):
                sess.process_frame(images[i], i * 0.033, i)

        s_ref = SlamSession(cam=cam, image_width=bench.W, image_height=bench.H)
        warm(s_ref)
        ref = [s_ref.process_frame(images[i], i * 0.033, i) for i in range(40, 52)]

        s_chunk = SlamSession(cam=cam, image_width=bench.W, image_height=bench.H)
        warm(s_chunk)
        got = []
        for base in (40, 44, 48):
            ids = list(range(base, base + 4))
            got.extend(s_chunk.process_frames_chunked(
                [images[i] for i in ids], [i * 0.033 for i in ids], ids))
        got.extend(s_chunk.flush_chunks())

        s_stream = SlamSession(cam=cam, image_width=bench.W, image_height=bench.H)
        warm(s_stream)
        bank = jnp.stack(images)
        got_s = s_stream.process_frame_stream(
            bank, [i * 0.033 for i in range(52)], list(range(52)),
            start=40, stop=52, chunk=4)

        assert len(got) == len(ref) and len(got_s) == len(ref)
        for a, b, c in zip(ref, got, got_s):
            assert a.state == b.state == c.state
            if a.pose is not None:
                np.testing.assert_allclose(np.asarray(a.pose.t),
                                           np.asarray(b.pose.t), atol=1e-4)
                np.testing.assert_allclose(np.asarray(a.pose.t),
                                           np.asarray(c.pose.t), atol=1e-4)


class TestLongRun:
    def test_banks_stay_bounded_and_tracking_survives(self, rng):
        """120 frames over a long revisiting trajectory: culling keeps the
        keyframe bank bounded and tracking never permanently dies."""
        rng2 = np.random.RandomState(9)
        pts, descs = make_world(rng2, n=500)
        sess = SlamSession(cam=CAM, image_width=int(W), image_height=int(H))

        def center(t):
            # out-and-back sweep: forces keyframes then revisits
            return np.array([1.2 * np.sin(0.5 * t), 0.05 * np.sin(2 * t), 0.0],
                            np.float32)

        def pose(t):
            c = center(t)
            if t < 0.6:   # initial linear leg for parallax
                c = np.array([0.9 * t, 0.0, 0.0], np.float32)
            return Pose(jnp.eye(3), jnp.asarray(-c))

        for i in range(120):
            t = i * 0.033
            sess.process_features(frame_features(pts, descs, pose(t), sess.N, rng2),
                                  t, i)
        states = [r.state for r in sess.results]
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= 90, (tracked, states[-10:])
        n_kf = int(jnp.sum(sess.map.kf_valid))
        n_mp = int(jnp.sum(sess.map.mp_valid))
        assert 2 <= n_kf <= 64, n_kf
        assert n_mp <= 4000, n_mp
        # trajectory stays sane
        ids, mats = sess.fossilize(global_ba_steps=0)
        assert np.isfinite(mats).all()
