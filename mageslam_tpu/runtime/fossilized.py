"""FossilizedMap: the frozen post-mortem queryable map.

Replaces MAGESlam::FossilizedMap (MageSlam.h:109-128, MageSlam.cpp:411-438):
after Fossilize, the caller can query tracking results for arbitrary frames,
export the point cloud (optionally denoised), and compute the volume of
interest from the recorded pose history + bounding depths.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..analysis.clouds import reposition_points
from ..analysis.voi import VoiSettings, calculate_volume_of_interest, make_voi_keyframes


class FossilizedMap:
    def __init__(self, map_state, pose_history, fes):
        self._map = map_state
        self._history = pose_history
        self._fes = fes
        poses, valid = pose_history.derive_poses(map_state.kf_pose)
        self._poses = poses
        self._valid = np.asarray(valid)
        self._ids = np.asarray(pose_history.frame_id)

    # -- GetTrackingResultsForFrames ------------------------------------- #
    def get_tracking_results(self, frame_ids) -> list[np.ndarray | None]:
        """Per requested frame id: the 4×4 world→camera view matrix, or None
        if that frame was never tracked."""
        mats = np.asarray(self._poses.matrix())
        lut = {int(fid): i for i, fid in enumerate(self._ids) if self._valid[i]}
        out = []
        for fid in frame_ids:
            i = lut.get(int(fid))
            out.append(mats[i] if i is not None else None)
        return out

    def trajectory(self):
        """(frame_ids, (M,4,4) view matrices) sorted by frame id."""
        mats = np.asarray(self._poses.matrix())
        ok = self._valid
        order = np.argsort(self._ids[ok])
        return self._ids[ok][order], mats[ok][order]

    # -- point cloud ------------------------------------------------------ #
    def map_points(self, denoised: bool = False) -> np.ndarray:
        """(M, 3) world positions of the fossilized cloud; `denoised` runs
        the Clouds/DeNoising repositioning pass first."""
        valid = self._map.mp_valid
        pos = self._map.mp_pos
        if denoised:
            pos = reposition_points(pos, valid)
        return np.asarray(pos)[np.asarray(valid)]

    # -- TryGetVolumeOfInterest ------------------------------------------- #
    def try_get_volume_of_interest(self, settings: VoiSettings = VoiSettings()):
        """Returns (min_corner, max_corner) or None (MageSlam.cpp:427-438 —
        computed from the historical poses + their bounding depths)."""
        valid = jnp.asarray(self._valid) & (self._history.far > 0)
        kf = make_voi_keyframes(
            self._poses, self._history.near, self._history.far, valid, settings)
        lo, hi, ok = calculate_volume_of_interest(kf, settings)
        if not bool(ok):
            return None
        return np.asarray(lo), np.asarray(hi)
