"""End-to-end loop closure on photoreal imagery (EVAL.md 'Loop closure').

Runs the full 360° orbit (336 frames) through apps/loop_eval.py and asserts
the headline result: tracking survives the revolution, a loop closure fires
on the revisit, and the closed-loop ATE stays bounded.

~7-10 min on one CPU core — far heavier than the rest of the suite, so it
only runs when MAGESLAM_RUN_SLOW=1 (CI runs the fast suite; this is the
repeatable command behind the EVAL.md loop-closure numbers, also runnable as
`python -m mageslam_tpu.apps.loop_eval`)."""

import os

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("MAGESLAM_RUN_SLOW"),
    reason="10-minute end-to-end run; set MAGESLAM_RUN_SLOW=1",
)


def test_orbit_closes_loop():
    from mageslam_tpu.apps.loop_eval import run_orbit_eval

    r = run_orbit_eval(n_frames=336, period=288, verbose=False)
    assert r["tracked"] >= 0.85 * r["n_frames"], r
    assert r["loops_closed"] >= 1, r
    # full-loop ATE: monocular drift around a 5.4 m ring, closed at the join
    assert r["ate_rmse"] < 0.2, r


def test_orbit_closes_loop_stream_path():
    """Same orbit through process_frames_chunked at pipelining depth: loop
    DETECTION dispatches at chunk resolution and its flag rides the next
    group summary fetch (_resolve_loop_dets) — the bench path. The closure
    must still fire and the trajectory stay bounded (measured 2026-08-19:
    tracked 315/336, 2 closures, ATE 0.143 m vs sync 0.118 m)."""
    from mageslam_tpu.apps.loop_eval import run_orbit_eval

    r = run_orbit_eval(n_frames=336, period=288, verbose=False, mode="stream")
    assert r["tracked"] >= 0.85 * r["n_frames"], r
    assert r["loops_closed"] >= 1, r
    assert r["ate_rmse"] < 0.2, r


def test_fig8_tracks_honestly_blocked():
    """Figure-8 on rendered pixels (VERDICT r4 #3) — status HONEST-BLOCKED
    on scene geometry, not the pipeline (EVAL.md 'Figure-8'): an
    outward-looking lobe inside this room has parallax-to-content-turnover
    ratio r_lobe/depth ≈ 1.8 m / 2.5-4 m ≈ 0.6, vs the proven orbit's
    2.6/1.3 ≈ 2.0. The ratio is PERIOD-INDEPENDENT (both parallax and
    turnover scale with per-frame motion), so no speed makes it viable —
    monocular new-point creation starves against turnover and tracking
    dies mid-lobe (measured: 25/324 tracked from the mid-lobe start,
    5/324 from the crossing start). Larger lobes graze the walls (<1.2 m
    kills FAST response — render_scene scene notes).

    The two-distinct-loop CAPABILITY — sibling detections of a DISTINCT
    cluster re-attempted against the post-closure map while same-loop
    siblings drop — is pinned with real detect/close math at unit level
    (test_stream_loop_closure.py) and two sequential closures on real
    pixels by the endurance test below. This test pins the measured
    blocked state so a renderer/scene fix is noticed."""
    from mageslam_tpu.apps.loop_eval import run_orbit_eval

    r = run_orbit_eval(n_frames=120, period=288, verbose=False,
                       mode="stream", trajectory="fig8")
    # init succeeds and the tracked prefix is accurate; full-lobe survival
    # is the blocked part
    assert r["n_poses"] >= 5, r
    assert r["ate_rmse"] < 0.1, r


def test_orbit_endurance_two_revolutions_stream():
    """Multi-revolution endurance through the stream path (VERDICT r3 #4,
    reference Runtime.cpp:552-573's sustained loop schedule): 2.33 orbit
    revolutions at bench pipelining depth — repeated detections on a bank
    with a full revolution of culling churn between them. Both revisits
    must close (one per revolution), tracking must survive, and the
    end-state ATE must match the single-revolution run (measured
    2026-08-19: 651/672 tracked, 2 closures, ATE 0.1032 m vs 0.1036 m
    sync single-revolution — no quality decay at depth; EVAL.md
    'Multi-revolution endurance')."""
    from mageslam_tpu.apps.loop_eval import run_orbit_eval

    r = run_orbit_eval(n_frames=672, period=288, verbose=False, mode="stream")
    assert r["tracked"] >= 0.9 * r["n_frames"], r
    assert r["loops_closed"] >= 2, r
    assert r["ate_rmse"] < 0.15, r
