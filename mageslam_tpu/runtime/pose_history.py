"""Pose history: every tracked frame's pose stored relative to a keyframe.

Replaces Map/PoseHistory.{h,cpp} + ThreadSafePoseHistory: the reference stores
each non-keyframe pose as interpolation connections to nearby keyframes so
that when BA or loop closure moves keyframes, historical poses re-derive
(PoseHistory.h:49-90, `AdjustPoses`). Here each historical pose keeps ONE
basis keyframe (the nearest at record time) and the relative transform
T_rel = T_frame ∘ T_kf⁻¹, so the updated pose is T_rel ∘ T_kf_new — a single
batched recompute over the whole table. (The reference interpolates up to
PoseHistorySettings connections; a single-basis scheme preserves the
capability — trajectory consistency under keyframe motion — with one gather.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose


class PoseHistory(NamedTuple):
    frame_id: jax.Array    # (H,) int32, -1 = empty
    basis_kf: jax.Array    # (H,) int32 keyframe slot
    rel: Pose              # (H,) relative transforms T_frame ∘ T_kf⁻¹
    near: jax.Array        # (H,) f32 near bounding-plane depth
    far: jax.Array         # (H,) f32 far bounding-plane depth
    count: jax.Array       # () int32 — next write index (ring buffer)

    @staticmethod
    def empty(capacity: int) -> "PoseHistory":
        return PoseHistory(
            frame_id=jnp.full((capacity,), -1, jnp.int32),
            basis_kf=jnp.zeros((capacity,), jnp.int32),
            rel=Pose.identity((capacity,)),
            near=jnp.zeros((capacity,), jnp.float32),
            far=jnp.zeros((capacity,), jnp.float32),
            count=jnp.int32(0),
        )

    def add(self, frame_id: jax.Array, pose: Pose, kf_pose: Pose,
            kf_slot: jax.Array, near=0.0, far=0.0) -> "PoseHistory":
        """AddHistoricalPose: record pose relative to its basis keyframe,
        with its bounding-plane depths (PoseHistory.h:88 VOI query needs them)."""
        rel = pose.compose(kf_pose.inverse())
        H = self.frame_id.shape[0]
        i = jnp.mod(self.count, H)
        return PoseHistory(
            frame_id=self.frame_id.at[i].set(jnp.asarray(frame_id, jnp.int32)),
            basis_kf=self.basis_kf.at[i].set(jnp.asarray(kf_slot, jnp.int32)),
            rel=Pose(self.rel.R.at[i].set(rel.R), self.rel.t.at[i].set(rel.t)),
            near=self.near.at[i].set(jnp.asarray(near, jnp.float32)),
            far=self.far.at[i].set(jnp.asarray(far, jnp.float32)),
            count=self.count + 1,
        )

    def derive_poses(self, kf_pose_bank: Pose) -> tuple[Pose, jax.Array]:
        """Re-derive every stored pose from the CURRENT keyframe poses
        (PoseHistory::UpdateKeyframePose / AdjustPoses semantics — batched).
        Returns (poses (H,), valid (H,))."""
        kf = Pose(kf_pose_bank.R[self.basis_kf], kf_pose_bank.t[self.basis_kf])
        return self.rel.compose(kf), self.frame_id >= 0

    def rebase(self, old_kf_poses: Pose, kf_removed: jax.Array,
               new_basis: jax.Array, kf_pose_bank: Pose) -> "PoseHistory":
        """When a keyframe is culled, entries based on it re-anchor to
        `new_basis` keeping the same world pose (PoseHistory keyframe-removal
        fixup). old_kf_poses: bank BEFORE removal."""
        affected = kf_removed[self.basis_kf] & (self.frame_id >= 0)
        world, _ = self.derive_poses(old_kf_poses)
        nb = jnp.where(affected, new_basis, self.basis_kf)
        kf_new = Pose(kf_pose_bank.R[nb], kf_pose_bank.t[nb])
        rel_new = world.compose(kf_new.inverse())
        return self._replace(
            basis_kf=nb,
            rel=Pose(
                jnp.where(affected[:, None, None], rel_new.R, self.rel.R),
                jnp.where(affected[:, None], rel_new.t, self.rel.t),
            ),
        )
