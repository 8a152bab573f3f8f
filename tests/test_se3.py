import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from mageslam_tpu.geometry import se3
from mageslam_tpu.geometry.se3 import Pose


def random_rotations(rng, n):
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_exp_log_so3_roundtrip(rng):
    phi = rng.randn(64, 3).astype(np.float32)
    R = se3.exp_so3(jnp.asarray(phi))
    # against scipy
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
    phi_back = se3.log_so3(R)
    np.testing.assert_allclose(np.asarray(phi_back), phi, atol=1e-4)


def test_exp_so3_small_angle(rng):
    phi = (rng.randn(16, 3) * 1e-6).astype(np.float32)
    R = np.asarray(se3.exp_so3(jnp.asarray(phi)))
    R_ref = Rotation.from_rotvec(phi).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_exp_log_se3_roundtrip(rng):
    twist = rng.randn(32, 6).astype(np.float32) * 0.5
    pose = se3.exp_se3(jnp.asarray(twist))
    back = se3.log_se3(pose)
    np.testing.assert_allclose(np.asarray(back), twist, atol=1e-4)


def test_pose_compose_inverse(rng):
    R = random_rotations(rng, 8)
    t = rng.randn(8, 3).astype(np.float32)
    p = Pose(jnp.asarray(R), jnp.asarray(t))
    ident = p.compose(p.inverse())
    np.testing.assert_allclose(np.asarray(ident.R), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident.t), 0, atol=1e-5)


def test_pose_matrix_roundtrip(rng):
    R = random_rotations(rng, 4)
    t = rng.randn(4, 3).astype(np.float32)
    p = Pose(jnp.asarray(R), jnp.asarray(t))
    p2 = Pose.from_matrix(p.matrix())
    np.testing.assert_allclose(np.asarray(p2.R), R, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2.t), t, atol=1e-6)


def test_transform_matches_matrix(rng):
    R = random_rotations(rng, 4)
    t = rng.randn(4, 3).astype(np.float32)
    pts = rng.randn(4, 3).astype(np.float32)
    p = Pose(jnp.asarray(R), jnp.asarray(t))
    out = np.asarray(p.transform(jnp.asarray(pts)))
    ref = np.einsum("nij,nj->ni", R, pts) + t
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_center(rng):
    R = random_rotations(rng, 4)
    t = rng.randn(4, 3).astype(np.float32)
    p = Pose(jnp.asarray(R), jnp.asarray(t))
    c = np.asarray(p.center())
    # x_cam = R c + t = 0
    np.testing.assert_allclose(np.einsum("nij,nj->ni", R, c) + t, 0, atol=1e-5)


def test_quat_roundtrip(rng):
    R = random_rotations(rng, 64)
    q = se3.rot_to_quat(jnp.asarray(R))
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    # against scipy (scipy is xyzw)
    q_ref = Rotation.from_matrix(R).as_quat()  # x,y,z,w
    q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
    q_ref *= np.where(q_ref[:, :1] >= 0, 1.0, -1.0)
    np.testing.assert_allclose(np.abs(np.asarray(q)), np.abs(q_ref), atol=1e-4)


def test_retract_is_left_multiplication(rng):
    R = random_rotations(rng, 4)
    t = rng.randn(4, 3).astype(np.float32)
    twist = (rng.randn(4, 6) * 0.1).astype(np.float32)
    p = Pose(jnp.asarray(R), jnp.asarray(t))
    p2 = se3.retract(p, jnp.asarray(twist))
    expected = se3.exp_se3(jnp.asarray(twist)).compose(p)
    np.testing.assert_allclose(np.asarray(p2.R), np.asarray(expected.R), atol=1e-6)


def test_interpolate_pose_endpoints(rng):
    R = random_rotations(rng, 2)
    t = rng.randn(2, 3).astype(np.float32)
    p0 = Pose(jnp.asarray(R[0]), jnp.asarray(t[0]))
    p1 = Pose(jnp.asarray(R[1]), jnp.asarray(t[1]))
    a0 = se3.interpolate_pose(p0, p1, jnp.float32(0.0))
    a1 = se3.interpolate_pose(p0, p1, jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(a0.R), R[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(a1.R), R[1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(a0.center()), np.asarray(p0.center()), atol=1e-4)
