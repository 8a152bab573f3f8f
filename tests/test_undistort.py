"""Dense image undistortion + stereo rescale vs the OpenCV oracle
(ImagePreprocessor parity: cv::initUndistortRectifyMap/remap and
ScaleImageForCameraConfiguration — ImagePreprocessor.cpp:18-120)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from mageslam_tpu.geometry.camera import make_poly3k, make_pinhole
from mageslam_tpu.geometry.se3 import Pose
from mageslam_tpu.ops.undistort import (
    rescale_image,
    scale_for_camera_configuration,
    undistort_image,
    undistorted_calibration,
)

W, H = 320, 240
K1, K2, K3, P1, P2 = -0.28, 0.07, 0.0, 1e-3, -5e-4


def make_test_image(rng):
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)
    img = 255 * (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    return img.astype(np.float32)


class TestUndistortImage:
    def test_matches_cv2_remap(self, rng):
        cam = make_poly3k(260.0, 262.0, 150.0, 125.0, K1, K2, K3, P1, P2, W, H)
        img = make_test_image(rng)
        out, und_cal = undistort_image(jnp.asarray(img), cam)

        # oracle: same recipe as ImagePreprocessor::UndistortImage — new
        # camera matrix keeps fx/fy, principal point at image center
        Km = np.array([[260.0, 0, 150.0], [0, 262.0, 125.0], [0, 0, 1]])
        Kn = Km.copy()
        Kn[0, 2] = W * 0.5
        Kn[1, 2] = H * 0.5
        dist = np.array([K1, K2, P1, P2, K3])      # cv2 order
        m1, m2 = cv2.initUndistortRectifyMap(Km, dist, None, Kn, (W, H),
                                             cv2.CV_32FC1)
        ref = cv2.remap(img, m1, m2, cv2.INTER_LINEAR)

        got = np.array(out)
        # compare away from the border (border policies differ)
        inner = (slice(10, H - 10), slice(10, W - 10))
        err = np.abs(got[inner] - ref[inner])
        assert np.median(err) < 0.5, np.median(err)
        assert np.percentile(err, 99) < 4.0, np.percentile(err, 99)

        uc = np.array(und_cal)
        assert uc[0] == 260.0 and uc[1] == 262.0
        assert uc[2] == W * 0.5 and uc[3] == H * 0.5
        assert uc[14] == 0.0     # pinhole

    def test_pinhole_roundtrip_identity(self, rng):
        cam = make_pinhole(260.0, 260.0, W / 2, H / 2, W, H)
        img = make_test_image(rng)
        out, _ = undistort_image(jnp.asarray(img), cam)
        np.testing.assert_allclose(np.array(out), img, atol=1e-3)


class TestStereoRescale:
    def test_equal_cameras_scale_one(self):
        cam = make_pinhole(260.0, 260.0, W / 2, H / 2, W, H)
        rel = Pose(jnp.eye(3), jnp.array([-0.1, 0.0, 0.0]))
        scale, ok = scale_for_camera_configuration(cam, cam, rel, 5.0)
        assert bool(ok)
        assert abs(float(scale) - 1.0) < 0.05, float(scale)

    def test_double_focal_target_scales_two(self):
        src = make_pinhole(260.0, 260.0, W / 2, H / 2, W, H)
        tgt = make_pinhole(520.0, 520.0, W / 2, H / 2, W, H)
        scale, ok = scale_for_camera_configuration(src, tgt, Pose.identity(),
                                                   5.0)
        assert bool(ok)
        assert abs(float(scale) - 2.0) < 0.05, float(scale)

    def test_opposite_cameras_no_overlap(self):
        src = make_pinhole(260.0, 260.0, W / 2, H / 2, W, H)
        # target looks the other way (180° about y)
        Ry = jnp.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
        rel = Pose(Ry, jnp.zeros(3))
        scale, ok = scale_for_camera_configuration(src, src, rel, 5.0)
        assert not bool(ok)

    def test_rescale_matches_cv2_resize(self, rng):
        img = make_test_image(rng)
        s = 0.5
        out = np.array(rescale_image(jnp.asarray(img), s, H, W))
        ref = cv2.resize(img, (W // 2, H // 2), interpolation=cv2.INTER_LINEAR)
        got = out[: H // 2, : W // 2]
        inner = (slice(4, H // 2 - 4), slice(4, W // 2 - 4))
        # sampling-grid conventions differ by half a pixel; compare loosely
        assert np.median(np.abs(got[inner] - ref[inner])) < 6.0


class TestSessionDistortedCamera:
    def test_tracks_with_poly3k_undistort_pixels(self, rng):
        """End-to-end: a session fed DISTORTED photoreal pixels with
        UndistortImagePixels=True initializes and tracks (the Lumia950-style
        Poly3K golden path, ImageAnalyzer.cpp:26-51)."""
        import dataclasses

        from mageslam_tpu.apps.render_scene import FX, FY, render_sequence
        from mageslam_tpu.config import golden_path_settings
        from mageslam_tpu.runtime import SlamSession, TrackingState

        w, h = 320, 180
        sx, sy = w / 640.0, h / 480.0
        cam = make_poly3k(FX * sx, FY * sy, w / 2, h / 2,
                          -0.15, 0.03, 0.0, 0.0, 0.0, w, h)

        s = golden_path_settings()
        s = dataclasses.replace(
            s, MonoSettings=dataclasses.replace(
                s.MonoSettings, MonoCamera=dataclasses.replace(
                    s.MonoSettings.MonoCamera, UndistortImagePixels=True)))
        sess = SlamSession(s, camera=cam, image_width=w, image_height=h)
        assert sess._undistort_pixels

        # distort each rendered (ideal-pinhole, center-pp) frame so the
        # session must undo it: sample the ideal image at distorted coords
        from mageslam_tpu.geometry.camera import distort_normalized, \
            pixel_to_normalized
        from mageslam_tpu.ops.undistort import remap_bilinear

        u, v = np.meshgrid(np.arange(w, dtype=np.float32),
                           np.arange(h, dtype=np.float32))
        px = jnp.asarray(np.stack([u, v], -1))
        # forward map for rendering a distorted image: output (distorted)
        # pixel ← ideal image at the UNDISTORTED location of that pixel
        from mageslam_tpu.geometry.camera import undistort_normalized
        xn = undistort_normalized(cam, pixel_to_normalized(cam, px))
        iu = cam[0] * xn[..., 0] + cam[2]
        iv = cam[1] * xn[..., 1] + cam[3]
        dist_map = jnp.stack([iu, iv], axis=-1)

        n_frames = 40
        states = []
        for img, ts, fid, R, c in render_sequence(n_frames, w, h):
            distorted = remap_bilinear(jnp.asarray(img, jnp.float32).astype(
                jnp.float32), dist_map)
            r = sess.process_frame(np.array(distorted), ts, fid)
            states.append(r.state)
        tracked = sum(st == TrackingState.TRACKING for st in states)
        assert sess.initialized
        assert tracked >= 0.6 * n_frames, (tracked, states)
    def test_keypoint_path_keeps_original_principal_point(self):
        """UndistortImagePixels=False (reference default): the frontend
        undistorts keypoints with P=K, so the matching/BA intrinsics must be
        the ORIGINAL fx/fy/cx/cy — a centered pp would bias every
        observation by (cx−w/2, cy−h/2)."""
        from mageslam_tpu.runtime import SlamSession

        cam = make_poly3k(260.0, 262.0, 150.0, 125.0, K1, K2, K3, P1, P2,
                          W, H)
        sess = SlamSession(camera=cam, image_width=W, image_height=H)
        assert not sess._undistort_pixels
        np.testing.assert_allclose(np.array(sess.cam),
                                   [260.0, 262.0, 150.0, 125.0])
