"""Stereo initialization tests: known-extrinsics pair bootstraps a unit-
baseline map; the extrinsic tether holds the rig transform through BA; the
session stereo path initializes on the first pair and tracks after."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.geometry.se3 import Pose
from mageslam_tpu.tracking.stereo_init import StereoInitSettings, stereo_initialize
from mageslam_tpu.runtime import SlamSession, TrackingState

from test_pipeline import CAM, W, H, frame_features, make_world, pose_at


def stereo_pair(rng, pts, descs, n_slots, baseline=0.12):
    """Rectified pair: camera1 at origin, camera0 shifted +x by baseline."""
    p0 = Pose.identity()
    p1 = Pose(jnp.eye(3), jnp.array([-baseline, 0.0, 0.0]))
    f0 = frame_features(pts, descs, p0, n_slots, rng, noise=0.2)
    f1 = frame_features(pts, descs, p1, n_slots, rng, noise=0.2)
    # camera0 → camera1: T1 ∘ T0⁻¹
    rel = p1.compose(p0.inverse())
    return f0, f1, rel, p0, p1


class TestStereoInit:
    def test_initializes_with_metric_structure(self, rng):
        pts, descs = make_world(rng, n=300)
        f0, f1, rel, p0, p1 = stereo_pair(rng, pts, descs, 512)
        res = stereo_initialize(
            f0.und_xy, f0.desc, f0.valid, f1.und_xy, f1.desc, f1.valid,
            CAM, rel,
            StereoInitSettings(max_depth_meters=12.0),
        )
        assert bool(res.succeeded), int(res.match_count)
        n_pts = int(jnp.sum(res.point_valid))
        assert n_pts >= 15
        # structure correct in baseline units: X * baseline ≈ world points
        ok = np.array(res.point_valid)
        feat1 = np.array(res.feat1)[ok]
        X = np.array(res.points)[ok] * 0.12
        # recover which world point each frame-0 feature slot is
        # (frame_features packs visible points in order)
        from test_pipeline import frame_features as ff
        Xc = np.array(Pose.identity().transform(jnp.array(pts)))
        uv = np.stack([float(CAM[0]) * Xc[:, 0] / Xc[:, 2] + float(CAM[2]),
                       float(CAM[1]) * Xc[:, 1] / Xc[:, 2] + float(CAM[3])], 1)
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < W - 10) \
            & (uv[:, 1] > 10) & (uv[:, 1] < H - 10)
        world_idx = np.where(vis)[0]
        matched_world = world_idx[feat1[feat1 < len(world_idx)]]
        # narrow-baseline triangulation: depth error ≈ z²σ/(f·b) — judge by
        # relative depth error, not absolute units
        err = np.linalg.norm(X - pts[matched_world], axis=1)
        rel_err = err / pts[matched_world][:, 2]
        assert np.median(rel_err) < 0.06, np.median(rel_err)

        # tether held: recovered pose2 ≈ normalized extrinsics
        np.testing.assert_allclose(np.array(res.pose2.R), np.eye(3), atol=5e-3)
        np.testing.assert_allclose(np.array(res.pose2.t), [-1.0, 0.0, 0.0],
                                   atol=5e-2)

    def test_rejects_zero_baseline(self, rng):
        pts, descs = make_world(rng, n=200)
        f0, f1, _, _, _ = stereo_pair(rng, pts, descs, 512)
        res = stereo_initialize(
            f0.und_xy, f0.desc, f0.valid, f1.und_xy, f1.desc, f1.valid,
            CAM, Pose.identity(),     # no displacement
            StereoInitSettings(),
        )
        assert not bool(res.succeeded)


class TestStereoSession:
    def test_session_stereo_bootstrap_then_tracks(self, rng):
        import dataclasses
        from mageslam_tpu.config import golden_path_settings

        pts, descs = make_world(rng)
        s = golden_path_settings()
        # the default MaxDepthMeters=2.3 (HoloLens-scale) rejects this 3-10 m
        # synthetic scene at a 0.12 m baseline
        s = dataclasses.replace(
            s, StereoSettings=dataclasses.replace(
                s.StereoSettings,
                StereoMapInitializationSettings=dataclasses.replace(
                    s.StereoSettings.StereoMapInitializationSettings,
                    MaxDepthMeters=12.0)))
        sess = SlamSession(s, cam=CAM, image_width=int(W), image_height=int(H))
        f0, f1, rel, _, _ = stereo_pair(rng, pts, descs, sess.N)
        r = sess.process_stereo_features(
            f0, f1, rel, 0.0, 0)
        assert r.state == TrackingState.TRACKING and r.is_keyframe
        assert sess.initialized
        # subsequent mono frames track immediately (no mono-init delay)
        for i in range(1, 6):
            t = i * 0.033
            feats = frame_features(pts, descs, pose_at(t * 0.2), sess.N, rng)
            r = sess.process_stereo_features(feats, feats, rel, t, i)
        tracked = [x for x in sess.results if x.state == TrackingState.TRACKING]
        assert len(tracked) >= 5

    def test_rig_tether_persists_through_mapping_bas(self, rng):
        """The stereo EXTRINSIC tether lives in MapState and is assembled
        into EVERY BA window (Data/Tether.h:12-68, BundleAdjust.cpp:57-113)
        — not just the one-shot init BA. After many tracked frames and
        multiple keyframe mapping BAs, the rig transform between the two
        init keyframes still matches the normalized extrinsics."""
        import dataclasses
        from mageslam_tpu.config import golden_path_settings

        pts, descs = make_world(rng, n=500)
        s = golden_path_settings()
        s = dataclasses.replace(
            s, StereoSettings=dataclasses.replace(
                s.StereoSettings,
                StereoMapInitializationSettings=dataclasses.replace(
                    s.StereoSettings.StereoMapInitializationSettings,
                    MaxDepthMeters=12.0)),
            # loosen the keyframe gates so MANY mapping BAs run in a short
            # window — the point is tether survival across repeated BA, not
            # keyframe cadence
            KeyframeSettings=dataclasses.replace(
                s.KeyframeSettings,
                KeyframeDecisionMaxTrackingPointMatches=100000,
                KeyframeDecisionMaxTrackingPointOverlap=0.98))
        sess = SlamSession(s, cam=CAM, image_width=int(W), image_height=int(H))
        f0, f1, rel, _, _ = stereo_pair(rng, pts, descs, sess.N)
        r = sess.process_stereo_features(f0, f1, rel, 0.0, 0)
        assert sess.initialized
        # tether persisted in the bank
        tw = np.array(sess.map.tether_weight)
        assert (tw > 0).sum() == 1
        slot = int(np.argmax(tw > 0))
        assert int(sess.map.tether_owner[slot]) == 1
        assert int(sess.map.tether_origin[slot]) == 0

        # drive mono tracking with noisy features so mapping BAs perturb poses
        n_kf_events = 0
        for i in range(1, 40):
            t = i * 0.033
            feats = frame_features(pts, descs, pose_at(2.2 * t), sess.N, rng,
                                   noise=0.4)
            res = sess.process_features(feats, t, i)
            n_kf_events += res.is_keyframe
        assert n_kf_events >= 5, "window must run several mapping BAs"

        # the tether is included in the local window when both kfs are in it
        from mageslam_tpu.worldmap.ba_window import build_local_ba_window
        w = build_local_ba_window(sess.map, jnp.int32(1), max_cams=16,
                                  max_points=1024, max_obs=2048)
        assert float(jnp.max(w.problem.tether_weight)) > 0

        # rig transform between keyframe slots 0 and 1 held (unit baseline)
        T0 = Pose(sess.map.kf_pose.R[0], sess.map.kf_pose.t[0])
        T1 = Pose(sess.map.kf_pose.R[1], sess.map.kf_pose.t[1])
        rig = T1.compose(T0.inverse())
        np.testing.assert_allclose(np.array(rig.R), np.eye(3), atol=2e-2)
        np.testing.assert_allclose(np.array(rig.t), [-1.0, 0.0, 0.0], atol=5e-2)
