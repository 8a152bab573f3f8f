"""Pose history: every tracked frame's pose stored relative to keyframes.

Replaces Map/PoseHistory.{h,cpp} + Data/HistoricalPose.{h,cpp} +
ThreadSafePoseHistory: the reference stores each tracked frame's pose as
interpolation connections to up to `InitalInterpolationConnections`=4 nearby
keyframes (MageSettings.h:209-214) so that when BA or loop closure moves
keyframes, historical poses re-derive (PoseHistory.h:49-90 `AdjustPoses`,
HistoricalPose.cpp `ComputeWorldPosition`).

Here each historical pose keeps a fixed bank of K connection slots. Each
connection stores the reference's exact offset parameterization
(HistoricalPose::ComputeFrameOffset): in WORLD space,

  off_q = q_kf^-1 * q_frame        (rotation offset)
  off_p = R_kf_world^-1 (c_frame - c_kf)   (position offset in the kf frame)

and re-derivation blends the per-connection candidates weighted by
1 / (1e-5 + |off_p|) with sign-aligned quaternion averaging — the same math
as HistoricalPose::ComputeWorldPosition (LERP-averaged quaternions per the
reference's comment). One batched (H, K) recompute covers the whole table.

Deviation from the reference (documented in PARITY.md): connections are
chosen as the K nearest keyframes by camera-center distance at record time;
the reference ranks by covisibility (PoseHistory.cpp:25-56). Distance rank
is computable from the keyframe-center bank alone in O(K_max) per frame,
keeping the per-frame hot path free of the (K_max, N) association sweep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose, quat_conj, quat_mul, quat_to_rot, rot_to_quat

_FUDGE = 1e-5  # HistoricalPose.cpp scaleFudge


def _world_parts(pose: Pose):
    """View pose → (world quaternion (w,x,y,z), camera center)."""
    R_w = jnp.swapaxes(pose.R, -1, -2)
    return rot_to_quat(R_w), pose.center()


class PoseHistory(NamedTuple):
    frame_id: jax.Array   # (H,) int32, -1 = empty
    conn_kf: jax.Array    # (H, K) int32 keyframe slot per connection
    conn_ok: jax.Array    # (H, K) bool
    off_q: jax.Array      # (H, K, 4) f32 rotation offsets (w,x,y,z)
    off_p: jax.Array      # (H, K, 3) f32 position offsets (kf frame)
    near: jax.Array       # (H,) f32 near bounding-plane depth
    far: jax.Array        # (H,) f32 far bounding-plane depth
    count: jax.Array      # () int32 — next write index (ring buffer)

    @staticmethod
    def empty(capacity: int, connections: int = 4) -> "PoseHistory":
        return PoseHistory(
            frame_id=jnp.full((capacity,), -1, jnp.int32),
            conn_kf=jnp.zeros((capacity, connections), jnp.int32),
            conn_ok=jnp.zeros((capacity, connections), bool),
            off_q=jnp.zeros((capacity, connections, 4), jnp.float32)
            .at[..., 0].set(1.0),
            off_p=jnp.zeros((capacity, connections, 3), jnp.float32),
            near=jnp.zeros((capacity,), jnp.float32),
            far=jnp.zeros((capacity,), jnp.float32),
            count=jnp.int32(0),
        )

    @property
    def connections(self) -> int:
        return self.conn_kf.shape[1]

    def add(self, frame_id: jax.Array, pose: Pose, conn_poses: Pose,
            kf_slots: jax.Array, conn_ok: jax.Array,
            near=0.0, far=0.0) -> "PoseHistory":
        """AddHistoricalPose (PoseHistory.cpp:25-56): connect the frame to up
        to K keyframes, storing ComputeFrameOffset world-space offsets, plus
        its bounding-plane depths (the VOI query needs them, PoseHistory.h:88).

        conn_poses: (K,) view poses of the connection keyframes (pre-gathered);
        kf_slots: (K,) their keyframe slots; conn_ok: (K,) validity.
        """
        K = self.connections
        kf_slots = jnp.asarray(kf_slots, jnp.int32)[:K]
        conn_ok = jnp.asarray(conn_ok)[:K]
        kf = conn_poses
        q_kf, c_kf = _world_parts(kf)
        q_f, c_f = _world_parts(pose)
        off_q = quat_mul(quat_conj(q_kf), q_f[None, :])
        # R_kf_world^-1 = the view-pose rotation matrix itself
        off_p = jnp.einsum("kij,kj->ki", kf.R, c_f[None, :] - c_kf)
        H = self.frame_id.shape[0]
        i = jnp.mod(self.count, H)
        return self._replace(
            frame_id=self.frame_id.at[i].set(jnp.asarray(frame_id, jnp.int32)),
            conn_kf=self.conn_kf.at[i].set(kf_slots),
            conn_ok=self.conn_ok.at[i].set(conn_ok),
            off_q=self.off_q.at[i].set(off_q),
            off_p=self.off_p.at[i].set(off_p),
            near=self.near.at[i].set(jnp.asarray(near, jnp.float32)),
            far=self.far.at[i].set(jnp.asarray(far, jnp.float32)),
            count=self.count + 1,
        )

    def add_single(self, frame_id: jax.Array, pose: Pose, kf_pose: Pose,
                   kf_slot: jax.Array, near=0.0, far=0.0) -> "PoseHistory":
        """One-connection add (init keyframes: the frame IS the keyframe)."""
        K = self.connections
        bank = Pose(
            jnp.broadcast_to(kf_pose.R[None], (K, 3, 3)),
            jnp.broadcast_to(kf_pose.t[None], (K, 3)),
        )
        slots = jnp.full((K,), jnp.asarray(kf_slot, jnp.int32))
        ok = jnp.arange(K) == 0
        return self.add(frame_id, pose, bank, slots, ok, near, far)

    def derive_poses(self, kf_pose_bank: Pose) -> tuple[Pose, jax.Array]:
        """Re-derive every stored pose from the CURRENT keyframe poses —
        batched HistoricalPose::ComputeWorldPosition (distance-weighted
        position blend + sign-aligned quaternion average over connections).
        Returns (view poses (H,), valid (H,))."""
        kf = Pose(kf_pose_bank.R[self.conn_kf], kf_pose_bank.t[self.conn_kf])
        q_kf, c_kf = _world_parts(kf)                       # (H,K,4), (H,K,3)
        R_w_kf = jnp.swapaxes(kf.R, -1, -2)
        # per-connection candidates (ComputeOffsetPosition)
        q_i = quat_mul(q_kf, self.off_q)                    # (H,K,4)
        p_i = jnp.einsum("hkij,hkj->hki", R_w_kf, self.off_p) + c_kf
        w = jnp.where(
            self.conn_ok,
            1.0 / (_FUDGE + jnp.linalg.norm(self.off_p, axis=-1)),
            0.0,
        )                                                   # (H,K)
        # sign-align every quaternion to the first valid connection's
        first = jnp.argmax(self.conn_ok, axis=1)            # (H,)
        q_ref = jnp.take_along_axis(q_i, first[:, None, None], axis=1)
        sign = jnp.where(jnp.sum(q_i * q_ref, axis=-1) < 0.0, -1.0, 1.0)
        w_sum = jnp.sum(w, axis=1)
        safe = jnp.maximum(w_sum, _FUDGE)
        p = jnp.sum(w[..., None] * p_i, axis=1) / safe[:, None]
        q = jnp.sum((w * sign)[..., None] * q_i, axis=1)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        R_w = quat_to_rot(q)
        R_view = jnp.swapaxes(R_w, -1, -2)
        t_view = -jnp.einsum("hij,hj->hi", R_view, p)
        valid = (self.frame_id >= 0) & jnp.any(self.conn_ok, axis=1)
        return Pose(R_view, t_view), valid

    def rebase(self, old_kf_poses: Pose, kf_removed: jax.Array,
               new_basis: jax.Array, kf_pose_bank: Pose) -> "PoseHistory":
        """KeyframeRemoved (PoseHistory.h:77): connections to a culled
        keyframe re-anchor to `new_basis`, keeping the frame's current world
        pose (derived from the bank BEFORE removal). If the pose is already
        connected to `new_basis`, the dead connection is simply dropped
        (the reference never duplicates connections, HistoricalPose.cpp:22)."""
        affected = kf_removed[self.conn_kf] & self.conn_ok      # (H, K)
        has_nb = jnp.any(
            self.conn_ok & ~affected & (self.conn_kf == new_basis), axis=1)
        world, _ = self.derive_poses(old_kf_poses)
        q_f, c_f = _world_parts(world)                          # (H,4), (H,3)
        nb_pose = Pose(kf_pose_bank.R[new_basis], kf_pose_bank.t[new_basis])
        q_nb, c_nb = _world_parts(nb_pose)
        off_q_new = quat_mul(quat_conj(q_nb)[None, :], q_f)     # (H,4)
        off_p_new = jnp.einsum("ij,hj->hi", nb_pose.R, c_f - c_nb[None, :])
        # at most ONE slot re-anchors per row (the first affected one): a
        # frame losing 2+ connections must not gain duplicate new_basis
        # connections, which would double-weight new_basis in the
        # ComputeWorldPosition blend (no-duplicate invariant,
        # HistoricalPose.cpp:24)
        first_aff = jnp.cumsum(affected.astype(jnp.int32), axis=1) == 1
        reanchor = affected & ~has_nb[:, None] & first_aff
        drop = affected & ~reanchor
        return self._replace(
            conn_kf=jnp.where(reanchor, new_basis, self.conn_kf),
            conn_ok=self.conn_ok & ~drop,
            off_q=jnp.where(reanchor[..., None], off_q_new[:, None, :],
                            self.off_q),
            off_p=jnp.where(reanchor[..., None], off_p_new[:, None, :],
                            self.off_p),
        )
