"""Per-stage device timing of the hot per-frame/per-keyframe cores.

The bench decomposition (bench.py stderr) shows resolve time (≈ device-bound
compute) dominating each pass; this tool breaks that number into stages so
shaves target the real sinks (VERDICT r3 #1c, r4 #1a). It covers BOTH hot
cores: the in-scan mapping event (_mapping_fn) and the per-keyframe
RESOLUTION core (_get_kf_resolve_core — BoW add + detect_loop incl. its
relocalize cond), plus the per-frame base (frontend + track + post).

Phase 1 — capture a realistic state on local CPU:

    python tools/prof_mapping.py gen [--frames 130] [--workload bench|orbit]

`bench` replays bench.py's own 640×480 golden-settings exploring world (the
workload the driver measures); `orbit` renders the 320×180 loop-profile
orbit. Pickles {map, pose_history, history, bow, key, map_scale, image,
workload} to /tmp/mapstate.pkl.

Phase 2 — time each stage on the real chip:

    timeout 570 python tools/prof_mapping.py prof [--stages a,b,...]

loads the state and times every stage with the measurement method CLAUDE.md
documents for the relay: a device-side fori_loop of R iterations whose body
carries a GENUINE loop-dependent perturbation (so XLA cannot hoist it),
per-iteration time = (T(R) - T(1)) / (R - 1), min over trials. R is a traced
argument (fori_loop lowers to while_loop), so each stage compiles ONCE. The
`overhead` stage times the harness itself (perturb + full-pytree sum) for
subtraction. --stages filters to a comma-separated subset (relay compile
budget is the scarce resource; the persistent compile cache carries
executables across invocations).
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


def _bench_settings():
    import dataclasses

    from mageslam_tpu.config import golden_path_settings

    s = golden_path_settings()
    return dataclasses.replace(
        s, LoopClosureSettings=dataclasses.replace(
            s.LoopClosureSettings, MinKeyframe=3))


def _make_session(workload: str):
    import jax.numpy as jnp

    from mageslam_tpu.runtime import SlamSession

    if workload == "bench":
        import bench as benchmod

        cam = jnp.array([benchmod.FX, benchmod.FY, benchmod.CX, benchmod.CY],
                        jnp.float32)
        w, h = benchmod.W, benchmod.H
        sess = SlamSession(_bench_settings(), cam=cam,
                           image_width=w, image_height=h)
    else:
        from mageslam_tpu.apps.loop_eval import loop_profile_settings
        from mageslam_tpu.apps.render_scene import CX, CY, FX, FY

        w, h = 320, 180
        sx, sy = w / 640.0, h / 480.0
        cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
        sess = SlamSession(loop_profile_settings(), cam=cam,
                           image_width=w, image_height=h)
    return sess, w, h


def phase_gen(n_frames: int, workload: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sess, w, h = _make_session(workload)
    t0 = time.time()
    if workload == "bench":
        import bench as benchmod

        rng = np.random.RandomState(7)
        pts, patches = benchmod.build_world(rng)
        images = np.stack([
            np.clip(benchmod.render(pts, patches, i * 0.033), 0, 255)
            for i in range(n_frames)]).astype(np.uint8)
        ts_all = [i * 0.033 for i in range(n_frames)]
        ids_all = list(range(n_frames))
        for i in range(benchmod.WARMUP_FRAMES):
            sess.process_frame(images[i], ts_all[i], i)
            if i % 8 == 0:
                log(f"gen frame {i} ({time.time() - t0:.0f}s)")
        sess.process_frame_stream(jax.numpy.asarray(images), ts_all, ids_all,
                                  start=benchmod.WARMUP_FRAMES,
                                  stop=(n_frames // 32) * 32, chunk=32)
        sess.flush_chunks()
        image = images[(n_frames // 32) * 32 - 1]
    else:
        from mageslam_tpu.apps.render_scene import render_sequence

        image = None
        for img, ts, fid, _R, _c in render_sequence(n_frames, w, h,
                                                    trajectory="orbit",
                                                    period=288):
            sess.process_frame(img.astype("float32"), ts, fid)
            image = np.clip(img, 0, 255).astype(np.uint8)
            if fid % 24 == 0:
                log(f"gen frame {fid} ({time.time() - t0:.0f}s)")
    state = jax.device_get({
        "map": sess.map,
        "pose_history": sess.pose_history,
        "history": sess.history,
        "bow": sess.bow,
        "key": sess.key,
        "map_scale": sess.map_scale,
        "image": image,
        "workload": workload,
    })
    with open("/tmp/mapstate.pkl", "wb") as f:
        pickle.dump(state, f)
    n_kf = int(state["map"].kf_valid.sum())
    n_mp = int(state["map"].mp_valid.sum())
    log(f"gen done [{workload}]: {n_kf} keyframes, {n_mp} points, "
        f"({time.time() - t0:.0f}s) -> /tmp/mapstate.pkl")


def phase_prof(trials: int, reps: int, only: set[str] | None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mageslam_tpu.ba.problem import BAState
    from mageslam_tpu.ba.step import step_bundle_adjust
    from mageslam_tpu.bow.index import add_keyframe as bow_add_keyframe
    from mageslam_tpu.bow.index import query_keyframes
    from mageslam_tpu.geometry.se3 import Pose
    from mageslam_tpu.ops.frontend import detect_and_compute
    from mageslam_tpu.runtime.loop_closure import detect_loop
    from mageslam_tpu.runtime.pipeline import TrackedFrame
    from mageslam_tpu.worldmap.ba_window import (apply_ba_results,
                                                 build_local_ba_window)
    from mageslam_tpu.worldmap.covisibility import covisibility_matrix
    from mageslam_tpu.worldmap.map_state import (refresh_membership,
                                                 refresh_point_stats_slots)
    from mageslam_tpu.worldmap.new_points import create_new_map_points
    from mageslam_tpu.worldmap.operations import (cull_local_keyframes,
                                                  cull_recent_map_points,
                                                  insert_keyframe)

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    with open("/tmp/mapstate.pkl", "rb") as f:
        state = pickle.load(f)
    workload = state.get("workload", "orbit")
    m = jax.device_put(state["map"])
    ph = jax.device_put(state["pose_history"])
    h_hist = jax.device_put(state["history"])
    bow = jax.device_put(state["bow"])
    key = jax.device_put(state["key"])
    image = jax.device_put(jnp.asarray(state["image"]))
    map_scale = jnp.float32(state["map_scale"])
    log(f"devices: {jax.devices()}  workload: {workload}")

    sess, w, h = _make_session(workload)

    s = sess.settings
    fes = sess.fes
    b = s.Budgets
    cs = s.CovisibilitySettings
    ms = s.MappingSettings
    ts_ = s.TrackLocalMapSettings
    bas = s.BundleAdjustSettings
    ks = s.KeyframeSettings
    lc = s.LoopClosureSettings
    rs = s.RelocalizationSettings
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
    frame_raw = frame._replace(
        pose=Pose.identity(),
        assoc=jnp.full_like(frame.assoc, -1))
    ki_fid = m.kf_frame_id[ki]
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
    # constant track result for the post_fn stage input
    res_c = jax.jit(lambda mm, hh, fr: sess._track_fn(
        mm, hh, fr, Pose.identity(), jnp.asarray(False)))(m, h_hist, frame_raw)
    jax.block_until_ready((covis_c, window_c, st_c, out_c, res_c))
    # does the captured state qualify for the reloc branch of detect_loop?
    det_probe = jax.jit(lambda mm, bb, fr, kk: detect_loop(
        mm, bb, fr, ki, kk,
        covis_loop_threshold=cs.CovisLoopThreshold,
        covis_cluster_threshold=cs.CovisMinThreshold,
        min_cluster_size=lc.MinClusterSize,
        min_keyframes=lc.MinKeyframe,
        max_candidates=ms.MaxRelocQueryResults,
        reloc_kwargs=dict(
            min_brute_force=rs.MinBruteForceCorrespondences,
            min_radius_matches=rs.MinRadiusMatchCorrespondences,
            search_radius=lc.MatchSearchRadius,
        )))(m, bow, frame, key)
    log(f"constants materialized; detect_loop probe: detected="
        f"{bool(det_probe.detected)}, cluster_size="
        f"{int(np.asarray(det_probe.cluster_mask).sum())} "
        f"(reloc branch {'TAKEN' if bool(det_probe.detected) else 'likely skipped'})")

    # every stage input travels as a jit ARGUMENT (captured arrays become
    # compile-time constants — XLA then constant-folds whole stages, which
    # both wrecks compile time and lets the "measurement" run on air), and
    # EVERY leaf is perturbed with a loop-carried value so no part of the
    # stage is loop-invariant-hoistable: floats get +eps (1e-30 — below any
    # gate's resolution), ints/bools get a select on an always-false but
    # loop-carried predicate.
    inputs = {"m": m, "frame": frame, "frame_raw": frame_raw, "ph": ph,
              "h": h_hist, "bow": bow, "key": key, "image": image,
              "covis": covis_c, "window": window_c, "st_poses": st_c.poses,
              "st_points": st_c.points, "out": out_c, "slots": slots_c,
              "res": res_c, "eq": None}  # eq filled below

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

    # --- per-frame base path ---
    stages["frontend"] = lambda d: detect_and_compute(
        sess._preprocess_image(d["image"]), sess.cam16, fes, sess.N)
    stages["track_fn"] = lambda d: sess._track_fn(
        d["m"], d["h"], d["frame_raw"], Pose.identity(), jnp.asarray(False))
    stages["post_fn"] = lambda d: sess._post_fn(
        d["m"], d["h"], d["ph"], d["res"].frame, d["res"].found_delta,
        d["res"].predicted_delta, jnp.int32(5), jnp.int32(100))

    # --- per-keyframe RESOLUTION core (BoW add + loop detect) ---
    stages["bow_add"] = lambda d: bow_add_keyframe(
        d["bow"], ki, d["frame"].desc, d["frame"].kp_valid)
    stages["bow_query"] = lambda d: query_keyframes(
        d["bow"], d["frame"].desc, d["frame"].kp_valid)
    stages["detect_loop"] = lambda d: detect_loop(
        d["m"], d["bow"], d["frame"], ki, d["key"],
        covis_loop_threshold=cs.CovisLoopThreshold,
        covis_cluster_threshold=cs.CovisMinThreshold,
        min_cluster_size=lc.MinClusterSize,
        min_keyframes=lc.MinKeyframe,
        max_candidates=ms.MaxRelocQueryResults,
        reloc_kwargs=dict(
            min_brute_force=rs.MinBruteForceCorrespondences,
            min_radius_matches=rs.MinRadiusMatchCorrespondences,
            search_radius=lc.MatchSearchRadius,
        ))
    stages["kf_resolve"] = lambda d: sess._get_kf_resolve_core()(
        d["m"], d["bow"], d["frame"], ki, jnp.int32(ki_fid), d["key"])

    # --- mapping-core stages ---
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
    # --- small-tier BA variant (adaptive-padding experiment): the full-cap
    # shapes (32 cams / 2048 pts / 4096 obs) are mostly padding while the
    # map is small; these stages measure the same window at 16/1024/2048 to
    # size the two-tier lax.cond before committing to it ---
    _small = dict(max_cams=16, max_points=1024, max_obs=2048,
                  theta0=cs.CovisMinThreshold,
                  upper_connections=cs.UpperConnectionsForBA,
                  lower_connections=cs.LowerConnectionsForBA,
                  theta_min=cs.CovisMinThreshold,
                  theta_step=cs.CovisBaStepThreshold,
                  theta_max_steps=cs.MaxSteps)
    window_small_c = jax.jit(
        lambda mm: build_local_ba_window(mm, ki, **_small))(m)
    inputs["window_small"] = window_small_c
    stages["ba_window_build_small"] = lambda d: build_local_ba_window(
        d["m"], ki, **_small).problem
    stages["ba_lm4_small"] = lambda d: step_bundle_adjust(
        d["window_small"].problem,
        BAState.from_problem(d["window_small"].problem),
        widths, jnp.float32(bas.MaxOutlierError ** 2))[:2]
    stages["apply_ba_small"] = lambda d: apply_ba_results(
        d["m"], d["window_small"],
        BAState.from_problem(d["window_small"].problem).poses,
        BAState.from_problem(d["window_small"].problem).points,
        jnp.zeros((2048,), bool),
        fes.NumLevels, fes.ScaleFactor)
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
    from mageslam_tpu.ba.schur import build_normal_equations, solve_lm_system

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
    # --- pieces the mapping body runs that the plain stages above miss ---
    from mageslam_tpu.worldmap.member_index import build_fidx

    fidx_c = jax.jit(build_fidx)(m)
    inputs["fidx"] = fidx_c
    stages["build_fidx"] = lambda d: build_fidx(d["m"])
    stages["ph_rebase"] = lambda d: d["ph"].rebase(
        d["m"].kf_pose, jnp.zeros_like(d["m"].kf_valid), ki,
        d["m"].kf_pose)
    stages["pick_gate"] = lambda d: jax.tree.map(
        lambda a, c: jnp.where(
            jnp.reshape(d["m"].kf_valid[0], (1,) * a.ndim), a, c),
        d["m"], d["m"])
    # fidx-threaded variants (what mapping_body actually calls)
    stages["cull_recent_fidx"] = lambda d: cull_recent_map_points(
        d["m"], ki,
        d["m"].mp_valid & (((d["m"].mp_found + 1.0)
                            / (d["m"].mp_predicted + 1.0))
                           < ts_.RecentMapPointPctSuccess),
        min_keyframes_for_culling=ms.MinNumKeyframesForMapPointCulling,
        fidx=d["fidx"])
    stages["covis_fidx"] = lambda d: covisibility_matrix(
        d["m"], d["fidx"] >= 0)
    stages["refresh_slots_fidx"] = lambda d: refresh_point_stats_slots(
        d["m"], d["slots"], fes.NumLevels, fes.ScaleFactor, max_obs_kf=8,
        fidx=d["fidx"])
    stages["apply_ba_fidx"] = lambda d: apply_ba_results(
        d["m"], d["window"], d["st_poses"], d["st_points"], d["out"],
        fes.NumLevels, fes.ScaleFactor, fidx=d["fidx"])
    stages["cull_kf_fidx"] = lambda d: cull_local_keyframes(
        d["m"], ki, d["covis"], fes.NumLevels,
        covis_theta=cs.CovisMinThreshold,
        max_tracking_point_overlap=ks.MappingMaxTrackingPointOverlap,
        min_keyframe_covis_count=ks.MinimumKeyframeCovisibilityCount,
        fidx=d["fidx"])
    stages["new_points_fidx"] = lambda d: create_new_map_points(
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
        max_keyframe_angle_degrees=nps.MaxKeyframeAngleDegrees,
        fidx=d["fidx"]).state

    from mageslam_tpu.worldmap.map_state import point_octave_histogram
    from mageslam_tpu.worldmap.member_index import octave_histogram_of

    stages["octave_hist_fidx"] = lambda d: octave_histogram_of(
        d["fidx"], d["m"].kf_kp_octave, fes.NumLevels)
    stages["octave_hist_scatter"] = lambda d: point_octave_histogram(
        d["m"], fes.NumLevels)
    stages["cull_kf_fidx0"] = lambda d: cull_local_keyframes(
        d["m"], ki, d["covis"], fes.NumLevels,
        covis_theta=cs.CovisMinThreshold,
        max_tracking_point_overlap=ks.MappingMaxTrackingPointOverlap,
        min_keyframe_covis_count=ks.MinimumKeyframeCovisibilityCount,
        max_culls=0, fidx=d["fidx"])

    # the big composites LAST: if the relay starves them, the per-stage
    # numbers above are already printed
    stages["mapping_body"] = lambda d: sess._mapping_body(
        d["m"], d["frame"], map_scale)
    stages["full_mapping"] = lambda d: sess._mapping_fn(
        d["m"], d["ph"], d["frame"], map_scale)
    stages["scan_body_nonkf"] = lambda d: sess._scan_frame_body(
        (d["m"], d["h"], d["ph"], jnp.int32(5), jnp.int32(100)),
        d["image"], jnp.float32(12.0), jnp.int32(10_000), map_scale)

    if only:
        unknown = only - set(stages) - {"overhead"}
        if unknown:
            log(f"unknown stages ignored: {sorted(unknown)}")
        stages = {k: v for k, v in stages.items()
                  if k == "overhead" or k in only}

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
    for name, v in results.items():
        if name == "overhead":
            continue
        log(f"{name:22s} {(v - oh) * 1e3:8.3f} ms")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("phase", choices=["gen", "prof"])
    p.add_argument("--frames", type=int, default=130)
    p.add_argument("--workload", choices=["bench", "orbit"], default="bench")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--reps", type=int, default=17)
    p.add_argument("--stages", type=str, default="",
                   help="comma-separated stage subset")
    p.add_argument("--cpu", action="store_true",
                   help="force local CPU (script validation / rough ranking)")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.phase == "gen":
        phase_gen(args.frames, args.workload)
    else:
        only = {s.strip() for s in args.stages.split(",") if s.strip()} or None
        phase_prof(args.trials, args.reps, only)


if __name__ == "__main__":
    main()
