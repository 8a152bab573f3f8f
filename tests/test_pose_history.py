"""PoseHistory multi-connection interpolation semantics.

Oracle: Data/HistoricalPose.cpp ComputeFrameOffset/ComputeOffsetPosition/
ComputeWorldPosition — offsets in world space, re-derivation blends
connections weighted by 1/(1e-5 + |offset|) with sign-aligned quaternion
averaging (the HistoricalPoseUnitTest surface, PoseHistory.h:11-14).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mageslam_tpu.geometry.se3 import Pose, exp_so3
from mageslam_tpu.runtime.pose_history import PoseHistory


def _pose(axis_angle, center):
    """View pose with camera center `center` and world rotation exp(axis_angle)."""
    R_w = exp_so3(jnp.asarray(axis_angle, jnp.float32))
    R = R_w.T
    t = -R @ jnp.asarray(center, jnp.float32)
    return Pose(R, t)


def _bank(poses):
    return Pose(jnp.stack([p.R for p in poses]), jnp.stack([p.t for p in poses]))


def test_single_connection_roundtrip_exact():
    kf = _pose([0.1, -0.2, 0.3], [1.0, 2.0, 3.0])
    frame = _pose([0.3, 0.1, -0.2], [1.5, 1.8, 2.5])
    ph = PoseHistory.empty(8, connections=4)
    ph = ph.add_single(7, frame, kf, 0)
    poses, valid = ph.derive_poses(_bank([kf] * 3))
    assert bool(valid[0]) and int(np.asarray(ph.frame_id)[0]) == 7
    np.testing.assert_allclose(np.asarray(poses.R[0]), np.asarray(frame.R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(poses.t[0]), np.asarray(frame.t),
                               atol=1e-5)


def test_rigid_keyframe_motion_carries_history():
    """When every connected keyframe moves by one rigid world transform, the
    derived pose moves with them (the loop-closure AdjustPoses capability)."""
    kfs = [_pose([0.0, 0.0, 0.1], [0.0, 0.0, 0.0]),
           _pose([0.0, 0.1, 0.0], [2.0, 0.0, 0.0]),
           _pose([0.1, 0.0, 0.0], [0.0, 2.0, 0.0])]
    frame = _pose([0.05, 0.05, 0.05], [0.7, 0.6, 0.2])
    ph = PoseHistory.empty(8, connections=3)
    ph = ph.add(11, frame, _bank(kfs), jnp.arange(3), jnp.ones(3, bool))

    # rigid world motion g: x -> R_g x + t_g applied to all keyframes
    R_g = exp_so3(jnp.asarray([0.0, 0.3, 0.0]))
    t_g = jnp.asarray([0.5, -0.2, 1.0])

    def moved(p):
        R_w = p.R.T
        c = p.center()
        R_w2 = R_g @ R_w
        c2 = R_g @ c + t_g
        return Pose(R_w2.T, -R_w2.T @ c2)

    poses, valid = ph.derive_poses(_bank([moved(k) for k in kfs]))
    expect = moved(frame)
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(poses.R[0]), np.asarray(expect.R),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(poses.t[0]), np.asarray(expect.t),
                               atol=1e-4)


def test_distance_weighting_prefers_near_keyframe():
    """Reference weight = 1/(1e-5 + |offset|): a much closer keyframe should
    dominate the blend when connections disagree."""
    near_kf = _pose([0, 0, 0], [1.0, 0.0, 0.0])
    far_kf = _pose([0, 0, 0], [50.0, 0.0, 0.0])
    frame = _pose([0, 0, 0], [1.01, 0.0, 0.0])
    ph = PoseHistory.empty(4, connections=2)
    ph = ph.add(1, frame, _bank([near_kf, far_kf]), jnp.arange(2),
                jnp.ones(2, bool))
    # move ONLY the far keyframe: derived pose should barely move
    far_kf2 = _pose([0, 0, 0], [60.0, 5.0, 0.0])
    poses, _ = ph.derive_poses(_bank([near_kf, far_kf2]))
    c = np.asarray(poses.center()[0])
    np.testing.assert_allclose(c, [1.01, 0.0, 0.0], atol=0.02)


def test_rebase_preserves_world_pose():
    """Culling a connected keyframe re-anchors to the new basis without
    moving the derived world pose (PoseHistory::KeyframeRemoved)."""
    kfs = [_pose([0, 0, 0.2], [0.0, 0.0, 0.0]),
           _pose([0, 0.2, 0], [1.0, 0.0, 0.0]),
           _pose([0.2, 0, 0], [0.0, 1.0, 0.0])]
    bank = _bank(kfs)
    frame = _pose([0.1, 0.0, 0.1], [0.4, 0.3, 0.1])
    ph = PoseHistory.empty(4, connections=2)
    ph = ph.add(5, frame, Pose(bank.R[:2], bank.t[:2]), jnp.arange(2),
                jnp.ones(2, bool))
    before, _ = ph.derive_poses(bank)

    removed = jnp.asarray([False, True, False])
    ph2 = ph.rebase(bank, removed, jnp.int32(2), bank)
    after, valid = ph2.derive_poses(bank)
    assert bool(valid[0])
    assert not bool(jnp.any(ph2.conn_ok[0] & (ph2.conn_kf[0] == 1)))
    np.testing.assert_allclose(np.asarray(after.t[0]), np.asarray(before.t[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(after.R[0]), np.asarray(before.R[0]),
                               atol=1e-4)


def test_rebase_drops_duplicate_connection():
    """If the pose already connects to the new basis, the dead connection is
    dropped rather than duplicated (HistoricalPose.cpp:22 assert)."""
    kfs = [_pose([0, 0, 0], [0.0, 0.0, 0.0]),
           _pose([0, 0, 0], [1.0, 0.0, 0.0])]
    bank = _bank(kfs)
    frame = _pose([0, 0, 0], [0.5, 0.0, 0.0])
    ph = PoseHistory.empty(4, connections=2)
    ph = ph.add(3, frame, bank, jnp.arange(2), jnp.ones(2, bool))
    removed = jnp.asarray([False, True])
    ph2 = ph.rebase(bank, removed, jnp.int32(0), bank)
    ok = np.asarray(ph2.conn_ok[0])
    kf_ids = np.asarray(ph2.conn_kf[0])
    assert ok.sum() == 1 and kf_ids[ok.argmax()] == 0


def test_ring_buffer_wraps():
    kf = Pose.identity()
    ph = PoseHistory.empty(3, connections=2)
    for i in range(5):
        ph = ph.add_single(i, _pose([0, 0, 0], [float(i), 0, 0]), kf, 0)
    ids = set(np.asarray(ph.frame_id).tolist())
    assert ids == {2, 3, 4}
