"""Visual-inertial END-TO-END run (VERDICT r4 #6): rendered pixels + a
synthesized IMU stream through the public session API with UseFuser=true.

The fuser components are unit-proven (test_analysis_fuser.py); this asserts
the assembled path: AddSensorSample ordering/image fences, the FuserWorker
mode machine reaching TRACKING, metric-scale convergence against the known
ground-truth ratio, and tracking accuracy no worse than the vision-only
floor on the identical sequence (test_photoreal_ate's 0.06 m gate).

Reference architecture: Tasks/FuserWorker.cpp:37-80, Fuser/Fuser.h:34-75
(the reference's fuser internals are stubs — FuserStubs.cpp)."""

import numpy as np
import pytest

from mageslam_tpu.apps.vi_eval import run_vi_eval

N_FRAMES = 80


@pytest.fixture(scope="module")
def vi_run():
    return run_vi_eval(n_frames=N_FRAMES, verbose=False)


class TestVisualInertialE2E:
    def test_mode_machine_reaches_tracking(self, vi_run):
        # WAIT_FOR_MAGE_INIT → (mage init) → WAIT_FOR_GRAVITY →
        # SCALE_INIT → TRACKING, in order, all within the sequence
        tr = vi_run["transitions"]
        assert vi_run["final_mode"] == "TRACKING", vi_run
        assert "SCALE_INIT" in tr and "TRACKING" in tr, tr
        assert tr["SCALE_INIT"] < tr["TRACKING"], tr

    def test_metric_scale_converges(self, vi_run):
        # SCALE_INIT's estimate (metric metres per visual map unit) must
        # match the ground-truth path-length ratio. Tolerance covers IMU
        # noise/bias + the double-integration window (scale_window=10
        # frames at 30 fps).
        ms, st = vi_run["metric_scale"], vi_run["scale_true"]
        assert ms is not None, vi_run
        assert abs(ms - st) / st < 0.35, (ms, st)

    def test_tracking_no_worse_than_vision_only(self, vi_run):
        # same sequence + thresholds as test_photoreal_ate (the vision-only
        # floor): the fuser path must not degrade tracking
        assert vi_run["tracked"] >= 0.8 * N_FRAMES, vi_run
        assert vi_run["n_poses"] >= 0.75 * N_FRAMES, vi_run
        assert vi_run["ate_rmse"] < 0.06, vi_run
