"""Per-stage device timing of the in-scan mapping core (_mapping_fn).

The bench decomposition (bench.py stderr) showed the per-keyframe mapping
event dominating the resolve time (~55 ms/event at round-3 end); this tool
breaks that number into its stages so shaves target the real sinks
(VERDICT r3 next-step #1c).

Phase 1 — capture a realistic MapState on local CPU:

    python tools/prof_mapping.py gen [--frames 130]

renders the 360-degree orbit (apps/render_scene), runs it through
SlamSession at loop-profile settings, and pickles {map, pose_history,
map_scale} to /tmp/mapstate.pkl.

Phase 2 — time each stage on the real chip:

    timeout 570 python tools/prof_mapping.py prof

loads the state and times every mapping stage with the measurement method
CLAUDE.md documents for the relay: a device-side fori_loop of R iterations
whose body carries a GENUINE loop-dependent perturbation (so XLA cannot
hoist it), per-iteration time = (T(R) - T(1)) / (R - 1), min over trials.
R is a traced argument (fori_loop lowers to while_loop), so each stage
compiles ONCE. The `overhead` stage times the harness itself (perturb +
full-pytree sum) for subtraction.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def phase_gen(n_frames: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mageslam_tpu.apps.loop_eval import loop_profile_settings
    from mageslam_tpu.apps.render_scene import CX, CY, FX, FY, render_sequence
    from mageslam_tpu.runtime import SlamSession

    w, h = 320, 180
    sx, sy = w / 640.0, h / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    sess = SlamSession(loop_profile_settings(), cam=cam,
                       image_width=w, image_height=h)
    t0 = time.time()
    for img, ts, fid, _R, _c in render_sequence(n_frames, w, h,
                                                trajectory="orbit",
                                                period=288):
        sess.process_frame(img.astype("float32"), ts, fid)
        if fid % 24 == 0:
            log(f"gen frame {fid} ({time.time() - t0:.0f}s)")
    state = jax.device_get({
        "map": sess.map,
        "pose_history": sess.pose_history,
        "map_scale": sess.map_scale,
    })
    with open("/tmp/mapstate.pkl", "wb") as f:
        pickle.dump(state, f)
    n_kf = int(state["map"].kf_valid.sum())
    n_mp = int(state["map"].mp_valid.sum())
    log(f"gen done: {n_kf} keyframes, {n_mp} points, "
        f"({time.time() - t0:.0f}s) -> /tmp/mapstate.pkl")


def phase_prof(trials: int, reps: int) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mageslam_tpu.apps.loop_eval import loop_profile_settings
    from mageslam_tpu.apps.render_scene import CX, CY, FX, FY
    from mageslam_tpu.ba.problem import BAState
    from mageslam_tpu.ba.step import step_bundle_adjust
    from mageslam_tpu.runtime import SlamSession
    from mageslam_tpu.runtime.pipeline import TrackedFrame
    from mageslam_tpu.geometry.se3 import Pose
    from mageslam_tpu.worldmap.ba_window import (apply_ba_results,
                                                 build_local_ba_window)
    from mageslam_tpu.worldmap.covisibility import covisibility_matrix
    from mageslam_tpu.worldmap.map_state import (refresh_membership,
                                                 refresh_point_stats_slots)
    from mageslam_tpu.worldmap.operations import (cull_local_keyframes,
                                                  cull_recent_map_points,
                                                  insert_keyframe)
    from mageslam_tpu.worldmap.new_points import create_new_map_points

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    with open("/tmp/mapstate.pkl", "rb") as f:
        state = pickle.load(f)
    m = jax.device_put(state["map"])
    ph = jax.device_put(state["pose_history"])
    map_scale = jnp.float32(state["map_scale"])
    log(f"devices: {jax.devices()}")

    w, h = 320, 180
    sx, sy = w / 640.0, h / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    sess = SlamSession(loop_profile_settings(), cam=cam,
                       image_width=w, image_height=h)

    s = sess.settings
    fes = sess.fes
    b = s.Budgets
    cs = s.CovisibilitySettings
    ms = s.MappingSettings
    ts_ = s.TrackLocalMapSettings
    bas = s.BundleAdjustSettings
    ks = s.KeyframeSettings
    nps = ms.NewMapPointsCreationSettings
    per_cam = s.MonoSettings.MonoCamera

    # representative frame: the newest keyframe's rows (a frame that just
    # became a keyframe is exactly the mapping core's input)
    order = np.asarray(m.kf_order) + np.where(np.asarray(m.kf_valid), 0, -10**9)
    ki = int(order.argmax())
    log(f"newest keyframe slot {ki}, n_kf="
        f"{int(np.asarray(m.kf_valid).sum())}, "
        f"n_mp={int(np.asarray(m.mp_valid).sum())}")
    frame = TrackedFrame(
        pose=Pose(m.kf_pose.R[ki], m.kf_pose.t[ki]), cam=m.kf_cam[ki],
        kp_xy=m.kf_kp_xy[ki], kp_octave=m.kf_kp_octave[ki],
        desc=m.kf_desc[ki], kp_valid=m.kf_kp_valid[ki],
        assoc=m.kf_assoc[ki],
        timestamp=jnp.float32(0.0),
        frame_id=jnp.int32(10_000),
    )
    ki = jnp.int32(ki)

    covis_c = jax.jit(covisibility_matrix)(m)
    window_c = jax.jit(lambda mm: build_local_ba_window(
        mm, ki, max_cams=b.MaxBaCameras, max_points=b.MaxBaPoints,
        max_obs=b.MaxBaObservations, theta0=cs.CovisMinThreshold,
        upper_connections=cs.UpperConnectionsForBA,
        lower_connections=cs.LowerConnectionsForBA,
        theta_min=cs.CovisMinThreshold, theta_step=cs.CovisBaStepThreshold,
        theta_max_steps=cs.MaxSteps))(m)
    widths = bas.HuberWidth * (
        bas.HuberWidthScale ** jnp.arange(max(bas.NumSteps, 4),
                                          dtype=jnp.float32))
    st0 = BAState.from_problem(window_c.problem)
    st_c, _mse, out_c = jax.jit(lambda p, st: step_bundle_adjust(
        p, st, widths, jnp.float32(bas.MaxOutlierError ** 2)))(
        window_c.problem, st0)
    slots_c = jnp.where(frame.assoc >= 0, frame.assoc, -1)
    jax.block_until_ready((covis_c, window_c, st_c, out_c))
    log("constants materialized")

    # every stage input travels as a jit ARGUMENT (captured arrays become
    # compile-time constants — XLA then constant-folds whole stages, which
    # both wrecks compile time and lets the "measurement" run on air), and
    # EVERY leaf is perturbed with a loop-carried value so no part of the
    # stage is loop-invariant-hoistable: floats get +eps (1e-30 — below any
    # gate's resolution), ints/bools get a select on an always-false but
    # loop-carried predicate.
    inputs = {"m": m, "frame": frame, "ph": ph, "covis": covis_c,
              "window": window_c, "st_poses": st_c.poses,
              "st_points": st_c.points, "out": out_c, "slots": slots_c,
              "eq": None}  # filled below once the window constants exist

    def perturb_tree(tree, eps, pred):
        def pert(x):
            if not isinstance(x, (jax.Array, np.ndarray)) or jnp.ndim(x) is None:
                return x
            x = jnp.asarray(x)
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x + eps.astype(x.dtype)
            return jnp.where(pred, jnp.zeros_like(x), x)
        return jax.tree.map(pert, tree)

    stages = {}
    stages["overhead"] = lambda d: d["m"]
    stages["cheap_loop_closure"] = lambda d: sess._cheap_loop_closure(
        d["m"], d["frame"])
    stages["insert_keyframe"] = lambda d: insert_keyframe(
        d["m"], d["frame"].pose, d["frame"].cam, d["frame"].frame_id,
        d["frame"].kp_xy, d["frame"].kp_octave, d["frame"].desc,
        d["frame"].kp_valid, d["frame"].assoc)
    stages["cull_recent"] = lambda d: cull_recent_map_points(
        d["m"], ki,
        d["m"].mp_valid & (((d["m"].mp_found + 1.0)
                            / (d["m"].mp_predicted + 1.0))
                           < ts_.RecentMapPointPctSuccess),
        min_keyframes_for_culling=ms.MinNumKeyframesForMapPointCulling)
    stages["covisibility"] = lambda d: covisibility_matrix(d["m"])
    stages["new_points"] = lambda d: create_new_map_points(
        d["m"], ki, d["covis"], map_scale,
        num_levels=fes.NumLevels, pyramid_scale=fes.ScaleFactor,
        image_width=w, image_height=h, image_border=fes.PatchSize / 2.0,
        max_frames=nps.MaxFramesForNewPointsCreation,
        covis_theta=cs.CovisMinThreshold,
        max_epipolar_error=nps.MaxEpipolarError,
        min_distance_ratio=nps.MinAcceptedDistanceRatio,
        min_parallax_degrees=nps.MinParallaxDegrees,
        min_kf_distance_sq=nps.MinKeyframeDistanceForCreatingMapPointsSquared,
        grid_w=per_cam.NewPointGridWidth, grid_h=per_cam.NewPointGridHeight,
        max_grid_count=per_cam.NewPointMaxGridCount,
        max_hamming=nps.InitialMatcherSettings.MaxHammingDistance,
        min_hamming_diff=nps.InitialMatcherSettings.MinHammingDifference,
        search_radius=nps.NewMapPointsSearchRadius,
        max_keyframe_angle_degrees=nps.MaxKeyframeAngleDegrees).state
    stages["refresh_slots_512"] = lambda d: refresh_point_stats_slots(
        d["m"], d["slots"], fes.NumLevels, fes.ScaleFactor, max_obs_kf=8)
    stages["ba_window_build"] = lambda d: build_local_ba_window(
        d["m"], ki, max_cams=b.MaxBaCameras, max_points=b.MaxBaPoints,
        max_obs=b.MaxBaObservations, theta0=cs.CovisMinThreshold,
        upper_connections=cs.UpperConnectionsForBA,
        lower_connections=cs.LowerConnectionsForBA,
        theta_min=cs.CovisMinThreshold, theta_step=cs.CovisBaStepThreshold,
        theta_max_steps=cs.MaxSteps).problem
    stages["ba_lm4"] = lambda d: step_bundle_adjust(
        d["window"].problem,
        BAState.from_problem(d["window"].problem),
        widths, jnp.float32(bas.MaxOutlierError ** 2))[:2]
    stages["apply_ba"] = lambda d: apply_ba_results(
        d["m"], d["window"], d["st_poses"], d["st_points"], d["out"],
        fes.NumLevels, fes.ScaleFactor)
    stages["cull_keyframes"] = lambda d: cull_local_keyframes(
        d["m"], ki, d["covis"], fes.NumLevels,
        covis_theta=cs.CovisMinThreshold,
        max_tracking_point_overlap=ks.MappingMaxTrackingPointOverlap,
        min_keyframe_covis_count=ks.MinimumKeyframeCovisibilityCount)
    stages["refresh_membership"] = lambda d: refresh_membership(d["m"])

    # --- sub-stages of the two biggest sinks ---
    from mageslam_tpu.ba.residuals import (observation_residuals,
                                           tether_residuals)
    from mageslam_tpu.ba.schur import (build_normal_equations,
                                       solve_lm_system)

    def _bne(d):
        pr = d["window"].problem
        st = BAState.from_problem(pr)
        obs = observation_residuals(pr, st.poses, st.points, st.obs_info,
                                    widths[0])
        teth = tether_residuals(pr, st.poses)
        return build_normal_equations(pr, obs, teth)

    stages["ba_residuals"] = lambda d: observation_residuals(
        d["window"].problem,
        BAState.from_problem(d["window"].problem).poses,
        d["window"].problem.points,
        BAState.from_problem(d["window"].problem).obs_info, widths[0])
    stages["ba_normal_eqs"] = _bne

    inputs["eq"] = jax.jit(_bne)({"window": window_c})

    def _solve(d):
        return solve_lm_system(d["window"].problem, d["eq"],
                               jnp.float32(1e-4))

    stages["ba_schur_solve"] = _solve
    stages["refresh_slots_2048"] = lambda d: refresh_point_stats_slots(
        d["m"], d["window"].pt_slot, fes.NumLevels, fes.ScaleFactor,
        max_obs_kf=16)
    # the big composite compile LAST: if the relay starves it, the per-stage
    # numbers above are already printed
    stages["full_mapping"] = lambda d: sess._mapping_fn(
        d["m"], d["ph"], d["frame"], map_scale)

    results = {}
    for name, fn in stages.items():
        @jax.jit
        def run(R, inp, _fn=fn):
            def body(i, acc):
                eps = acc * jnp.float32(1e-30) + jnp.float32(1e-30)
                pred = acc > jnp.float32(1e18)          # always False, but
                d = perturb_tree(inp, eps, pred)        # loop-carried
                out = _fn(d)
                s = jnp.float32(0.0)
                for leaf in jax.tree.leaves(out):
                    leaf = jnp.asarray(leaf)
                    s = s + jnp.sum(leaf.astype(jnp.float32)) * jnp.float32(1e-30)
                return acc + s
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        run(jnp.int32(1), inputs).block_until_ready()
        t_compile = time.perf_counter() - t0
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            run(jnp.int32(1), inputs).block_until_ready()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(jnp.int32(reps), inputs).block_until_ready()
            tr = time.perf_counter() - t0
            best = min(best, (tr - t1) / (reps - 1))
        results[name] = best
        log(f"{name:22s} {best * 1e3:8.3f} ms/iter  (compile {t_compile:.1f}s)")

    oh = results.get("overhead", 0.0)
    log("--- net of harness overhead ---")
    total = 0.0
    for name, v in results.items():
        if name in ("overhead", "full_mapping"):
            continue
        total += v - oh
        log(f"{name:22s} {(v - oh) * 1e3:8.3f} ms")
    full = results.get("full_mapping")
    log(f"{'sum of stages':22s} {total * 1e3:8.3f} ms  vs full_mapping "
        f"{'n/a' if full is None else f'{(full - oh) * 1e3:.3f} ms'}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", choices=["gen", "prof"])
    p.add_argument("--frames", type=int, default=130)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--reps", type=int, default=17)
    p.add_argument("--cpu", action="store_true",
                   help="force local CPU (script validation / rough ranking)")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.phase == "gen":
        phase_gen(args.frames)
    else:
        phase_prof(args.trials, args.reps)


if __name__ == "__main__":
    main()
