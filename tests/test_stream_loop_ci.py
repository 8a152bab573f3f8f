"""End-to-end STREAM-PATH loop closure in the default suite (VERDICT r4 #2).

The deferred-detection machinery (flag riding the group fetch, slot-identity
guards, one-closure-per-batch + distinct-loop re-attempt) is the most
intricate host logic in the session; test_loop_eval.py exercises it at full
fidelity but is slow-gated (~12 min). This is the always-on variant: the
same 360° photoreal orbit through process_frames_chunked at pipelining
depth, at 240×135 — chosen by measurement (2026-08-20):

  320×180: 317/336 tracked, loop closes, ATE 0.143 — but ~12 min wall;
  240×135: loop closes with ATE 0.067 over the 123 tracked poses in ~5.5
           min — tracking health degrades (38%, renderer keypoint
           repeatability falls with resolution) but every piece of the
           deferred machinery engages;
  160×90:  no closure (tracking too sparse to build the revisit cluster).

So this test pins the MACHINERY (deferral, group-fetch resolution, guards,
closure application, bounded post-closure trajectory); tracking-health
fidelity is owned by the slow suite and test_photoreal_ate.

Reference: Tasks/Runtime.cpp:552-573 (loop worker trailing tracking)."""

from mageslam_tpu.apps.loop_eval import run_orbit_eval


def test_stream_orbit_closes_loop_ci():
    r = run_orbit_eval(n_frames=324, period=288, width=240, height=135,
                       verbose=False, mode="stream")
    assert r["loops_closed"] >= 1, r
    # enough trajectory to constitute a loop, and the closed portion is
    # accurate (measured 0.067 m; 2× margin)
    assert r["tracked"] >= 100, r
    assert r["ate_rmse"] < 0.15, r
    # the machinery under test provably engaged: detections were deferred
    # at chunk resolution, their flags resolved through group fetches, and
    # the closure came from the deferred path
    st = r["loop_det_stats"]
    assert st["deferred"] > 0 and st["closed"] >= 1, st
    assert st["resolved"] >= st["deferred"], st
