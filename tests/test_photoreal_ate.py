"""Accuracy regression gate on REAL PIXEL INPUT (EVAL.md).

Renders 80 photorealistic frames (textured raycast room: occlusion, shading,
lighting drift, sensor noise — mageslam_tpu/apps/render_scene.py) at the
golden-path tracking resolution and drives them through the full image path:
FAST → ANMS → rBRIEF → matching → 5-point init → tracking → mapping/BA →
fossilize. Asserts the trajectory against ground truth with the standard TUM
ATE protocol (Umeyama similarity alignment — monocular gauge).

This is the permanent floor under the north-star accuracy claim
(BASELINE.md): feature extraction and matching must hold up on natural image
statistics, not just on procedural feature streams."""

import numpy as np
import jax.numpy as jnp
import pytest

from mageslam_tpu.apps.evaluate import ate_rmse
from mageslam_tpu.apps.render_scene import FX, FY, CX, CY, render_sequence
from mageslam_tpu.config import golden_path_settings
from mageslam_tpu.runtime import SlamSession, TrackingState

W, H = 320, 180
N_FRAMES = 80


@pytest.fixture(scope="module")
def photoreal_run():
    sx, sy = W / 640.0, H / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    sess = SlamSession(golden_path_settings(), cam=cam,
                       image_width=W, image_height=H)
    gt_ts, gt_centers, est_states = [], [], []
    ts_by_id = {}
    for img, ts, fid, R, c in render_sequence(N_FRAMES, W, H):
        r = sess.process_frame(img.astype(np.float32), ts, fid)
        est_states.append(r.state)
        gt_ts.append(ts)
        gt_centers.append(c)
        ts_by_id[fid] = ts
    ids, mats = sess.fossilize(global_ba_steps=None)
    est_ts = np.array([ts_by_id[int(i)] for i in ids])
    est_centers = np.array([-m[:3, :3].T @ m[:3, 3] for m in mats])
    return est_states, est_ts, est_centers, np.array(gt_ts), np.array(gt_centers)


class TestPhotorealATE:
    def test_tracks_most_frames(self, photoreal_run):
        states = photoreal_run[0]
        tracked = sum(s == TrackingState.TRACKING for s in states)
        assert tracked >= 0.8 * N_FRAMES, (
            f"only {tracked}/{N_FRAMES} tracked: {states}")

    def test_ate_under_threshold(self, photoreal_run):
        _, est_ts, est_c, gt_ts, gt_c = photoreal_run
        rmse, n = ate_rmse(est_ts, est_c, gt_ts, gt_c)
        assert n >= 0.75 * N_FRAMES
        # measured 0.017 m at 640→320 downscale, EVAL.md; generous margin for
        # platform jitter. Trajectory spans ~2 m.
        assert rmse < 0.06, f"ATE RMSE {rmse:.4f} m over {n} poses"
