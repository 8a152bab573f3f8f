import cv2
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.geometry import camera, epipolar, se3, triangulation
from mageslam_tpu.geometry.se3 import Pose


def make_test_camera():
    return camera.make_poly3k(
        fx=458.0, fy=457.0, cx=367.0, cy=248.0,
        k1=-0.28, k2=0.07, k3=0.0, p1=1e-4, p2=-2e-5,
        width=752, height=480,
    )


def cv_dist_coeffs():
    # OpenCV order: k1, k2, p1, p2, k3
    return np.array([-0.28, 0.07, 1e-4, -2e-5, 0.0], np.float64)


def cv_K():
    return np.array([[458.0, 0, 367.0], [0, 457.0, 248.0], [0, 0, 1]], np.float64)


def test_distort_matches_opencv(rng):
    cam = make_test_camera()
    pts3 = rng.randn(200, 3).astype(np.float32)
    pts3[:, 2] = np.abs(pts3[:, 2]) + 2.0
    px, z = camera.project_camera_points(cam, jnp.asarray(pts3))
    ref, _ = cv2.projectPoints(
        pts3.reshape(-1, 1, 3).astype(np.float64),
        np.zeros(3), np.zeros(3), cv_K(), cv_dist_coeffs(),
    )
    np.testing.assert_allclose(np.asarray(px), ref.reshape(-1, 2), atol=0.01)
    np.testing.assert_allclose(np.asarray(z), pts3[:, 2], atol=1e-5)


def test_undistort_matches_opencv(rng):
    # cv2.undistortPoints runs only 5 fixed-point iterations by default, so it is
    # itself approximate near the image edges; compare loosely here and strictly
    # via the exact roundtrip test below.
    cam = make_test_camera()
    px = rng.uniform([50, 50], [700, 430], size=(100, 2)).astype(np.float32)
    und = camera.undistort_pixels(cam, jnp.asarray(px), iters=20)
    ref = cv2.undistortPoints(
        px.reshape(-1, 1, 2).astype(np.float64), cv_K(), cv_dist_coeffs(), P=cv_K()
    ).reshape(-1, 2)
    np.testing.assert_allclose(np.asarray(und), ref, atol=0.6)


def test_undistort_pixels_exact_roundtrip(rng):
    cam = make_test_camera()
    px = rng.uniform([50, 50], [700, 430], size=(100, 2)).astype(np.float32)
    und = camera.undistort_pixels(cam, jnp.asarray(px), iters=20)
    xn = camera.pixel_to_normalized(cam, und)
    xd = camera.distort_normalized(cam, xn)
    u = cam[0] * xd[..., 0] + cam[2]
    v = cam[1] * xd[..., 1] + cam[3]
    back = np.stack([np.asarray(u), np.asarray(v)], axis=-1)
    np.testing.assert_allclose(back, px, atol=0.01)


def test_undistort_roundtrip(rng):
    cam = make_test_camera()
    xn = (rng.rand(100, 2).astype(np.float32) - 0.5) * 0.8
    xd = camera.distort_normalized(cam, jnp.asarray(xn))
    back = camera.undistort_normalized(cam, xd, iters=15)
    np.testing.assert_allclose(np.asarray(back), xn, atol=1e-4)


def test_rational6k_reduces_to_poly3k():
    c6 = camera.make_rational6k(400, 400, 320, 240, -0.2, 0.05, 0.0, 0.0, 0.0, 0.0, 1e-4, 0.0, 640, 480)
    c3 = camera.make_poly3k(400, 400, 320, 240, -0.2, 0.05, 0.0, 1e-4, 0.0, 640, 480)
    xn = jnp.asarray(np.random.RandomState(1).randn(50, 2).astype(np.float32) * 0.3)
    np.testing.assert_allclose(
        np.asarray(camera.distort_normalized(c6, xn)),
        np.asarray(camera.distort_normalized(c3, xn)),
        atol=1e-7,
    )


def _two_view_setup(rng, n=50):
    pts = rng.randn(n, 3).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 4.0
    cam = camera.make_pinhole(400.0, 400.0, 320.0, 240.0, 640, 480)
    pose1 = Pose.identity()
    phi = np.array([0.02, -0.03, 0.01], np.float32)
    R2 = np.asarray(se3.exp_so3(jnp.asarray(phi)))
    t2 = np.array([-0.5, 0.1, 0.05], np.float32)
    pose2 = Pose(jnp.asarray(R2), jnp.asarray(t2))
    px1, z1 = camera.project_undistorted(cam, pose1.transform(jnp.asarray(pts)))
    px2, z2 = camera.project_undistorted(cam, pose2.transform(jnp.asarray(pts)))
    return pts, cam, pose1, px1, pose2, px2


def test_triangulate_midpoint(rng):
    pts, cam, pose1, px1, pose2, px2 = _two_view_setup(rng)
    tri = triangulation.triangulate_midpoint(cam, pose1, px1, cam, pose2, px2)
    np.testing.assert_allclose(np.asarray(tri), pts, atol=5e-3)


def test_triangulate_dlt(rng):
    pts, cam, pose1, px1, pose2, px2 = _two_view_setup(rng)
    tri = triangulation.triangulate_dlt(cam, pose1, px1, cam, pose2, px2)
    np.testing.assert_allclose(np.asarray(tri), pts, atol=5e-2)


def test_epipolar_distance_zero_for_true_matches(rng):
    pts, cam, pose1, px1, pose2, px2 = _two_view_setup(rng)
    F = epipolar.fundamental_matrix(pose1, cam, pose2, cam)
    d = epipolar.distance_from_epipolar_line(F, px1, px2)
    assert float(jnp.max(d)) < 0.05


def test_epipolar_distance_nonzero_for_mismatches(rng):
    pts, cam, pose1, px1, pose2, px2 = _two_view_setup(rng)
    F = epipolar.fundamental_matrix(pose1, cam, pose2, cam)
    px2_shuffled = jnp.asarray(np.asarray(px2)[::-1].copy())
    d = epipolar.distance_from_epipolar_line(F, px1, px2_shuffled)
    assert float(jnp.mean(d)) > 1.0


def test_reprojection_error(rng):
    pts, cam, pose1, px1, pose2, px2 = _two_view_setup(rng)
    err, z = triangulation.reprojection_error(cam, pose2, jnp.asarray(pts), px2)
    assert float(jnp.max(err)) < 1e-2
    assert float(jnp.min(z)) > 0
