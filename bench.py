"""Benchmark: per-frame pipeline throughput on 640×480 monocular input.

Each timed frame runs BOTH stages of the per-frame pipeline at full budgets:
  1. the ORB frontend (pyramid/FAST/ANMS/rBRIEF) on a real rendered 640×480
     grayscale image,
  2. the tracking fast path (motion prior → guided 3-radius match →
     two-stage track-local-map pose optimization) against a live map,
plus — because the trajectory EXPLORES fresh ground for the whole timed
window — the full mapping schedule (insert → cull → new points → local BA →
keyframe cull) firing at console keyframe cadence (~1 keyframe / 45-60
frames) IN the timed region, exactly the work MAGE-SLAM does per frame.

Fully end-to-end: the frontend's features from the rendered images drive
initialization and tracking (no side-channel ground truth). Tracking
correctness is enforced: untracked frames zero out the reported value.
Frames run through the chunked stream path (32 frames per compiled
dispatch, a device-side lax.scan of the same fused per-frame step — bit-
identical to the per-frame path, tests/test_pipeline.py TestChunkedFrameLoop
/ TestChunkedExploring). Images stream as uint8 (camera-native; 4× less
HBM/relay traffic than f32), converted on device.

Every timed pass starts from the SAME post-warmup session snapshot
(SlamSession.snapshot_state/restore_state — O(1), buffers are immutable):
each pass maps the same fresh ground, inserting the same keyframes, so
passes are comparable run-to-run and commit-to-commit (ADVICE r2) and the
median is over identical workloads.

Prints ONE JSON line. vs_baseline is against the reference's 30 fps design
target (TARGET_FRAME_RATE, Core/MAGESLAM/Source/MAGESlam.cpp:35-38) — the
only frame-rate figure the reference states (it publishes no measured
benchmarks; see BASELINE.md).
"""

import json
import time

import numpy as np

W, H = 640, 480
FX = FY = 520.0
CX, CY = 320.0, 240.0
N_POINTS = 700
N_FRAMES = 380
# warmup only needs: init (~2 frames in), the BoW retrain gate
# (TrainingFrames=15 pooled frames), and the first keyframes. 40 frames at
# r03 cost 500 of the 570 s budget in a bad relay-compile phase (VERDICT r3
# weak #2) — the stream warm chunk covers everything past frame 24.
WARMUP_FRAMES = 24
SPEED = 1.5     # u/s — console keyframe cadence on exploring ground
                # (overlap < 0.5 after ~2.5 u of travel ≈ 50 frames)


def build_world(rng):
    # world structure spread along the whole exploring trajectory
    # (SPEED * N_FRAMES/30 ≈ 19 units of travel)
    pts = np.stack([
        rng.uniform(-4, 23, N_POINTS),
        rng.uniform(-3, 3, N_POINTS),
        rng.uniform(3, 8, N_POINTS),
    ], 1).astype(np.float32)
    coarse = rng.randint(0, 256, (N_POINTS, 5, 5)).astype(np.float32)
    patches = np.empty((N_POINTS, 17, 17), np.float32)
    xs = np.linspace(0, 4, 17)
    for i in range(N_POINTS):
        rows = np.stack([np.interp(xs, np.arange(5), coarse[i, r]) for r in range(5)])
        patches[i] = np.stack([np.interp(xs, np.arange(5), rows[:, c])
                               for c in range(17)], axis=1)
    return pts, patches


def camera_center(t):
    # continuous exploration: fresh structure enters the view for the whole
    # run, so keyframes + mapping fire at console cadence INSIDE the timed
    # window (VERDICT r2 #1 — the old oscillating window re-tracked mapped
    # ground and the in-scan mapping branch almost never took its paid side)
    return np.array([SPEED * t, 0.05 * np.sin(1.5 * t), 0.0], np.float32)


def render(pts, patches, t):
    c = camera_center(t)
    Xc = pts - c[None, :]
    z = Xc[:, 2]
    u = FX * Xc[:, 0] / z + CX
    v = FY * Xc[:, 1] / z + CY
    img = np.zeros((H, W), np.float32)
    vis = (z > 1.0) & (u > 12) & (u < W - 12) & (v > 12) & (v < H - 12)
    for i in np.where(vis)[0]:
        x, y = int(round(u[i])), int(round(v[i]))
        img[y - 8:y + 9, x - 8:x + 9] = patches[i]
    return img


def onchip_selfchecks():
    """Correctness asserts ON THE REAL CHIP (VERDICT r1 #10 / ADVICE r1
    approx-topk): the Pallas Hamming kernel against the SWAR reference path,
    and approx_max_k candidate selection against exact top_k — both only
    take their fast form on TPU, so CI (forced-CPU) never exercises them
    where they run. Runs AFTER the timed passes (budget-gated): diagnostics,
    not a precondition — in a bad relay phase these two tiny compiles alone
    have cost 295-365 s."""
    import sys

    import jax
    import jax.numpy as jnp
    from mageslam_tpu.ops.matching import popcount_u32

    if jax.default_backend() != "tpu":
        return
    from mageslam_tpu.ops.pallas_kernels import hamming_matrix_pallas

    # shapes kept small: kernel-correctness coverage is shape-independent
    # and relay-side compile time is the bench's scarcest budget (a 512x448
    # pair + 307k-score topk cost ~156 s of compile through the tunnel)
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randint(0, 2**31, (256, 8)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 2**31, (192, 8)).astype(np.uint32))

    @jax.jit
    def both(a, b):
        swar = jnp.sum(popcount_u32(a[:, None, :] ^ b[None, :, :]), axis=-1)
        return hamming_matrix_pallas(a, b), swar

    d_pallas, d_swar = jax.device_get(both(a, b))
    assert (d_pallas == d_swar).all(), \
        f"pallas/SWAR mismatch: {np.abs(d_pallas - d_swar).max()}"

    scores = jnp.asarray(rng.rand(65536).astype(np.float32))

    @jax.jit
    def topk(s):
        _, exact = jax.lax.top_k(s, 256)
        _, approx = jax.lax.approx_max_k(s, 256, recall_target=0.99)
        return exact, approx

    exact, approx = jax.device_get(topk(scores))
    recall = len(set(exact.tolist()) & set(approx.tolist())) / 256.0
    assert recall >= 0.97, f"approx_max_k recall {recall}"
    print(f"onchip selfchecks ok (pallas exact, approx topk recall "
          f"{recall:.3f})", file=sys.stderr)


def frontend_parity(sess, img_u8):
    """End-to-end approx_max_k parity ON CHIP (VERDICT r3 #6): the FULL
    frontend (pyramid/FAST/ANMS/rBRIEF) on one real rendered frame — the
    TPU approx-selection path vs the exact-top_k variant traced for local
    CPU (ops.fast.FORCE_EXACT_TOPK; the CI-tested ground truth) — asserting
    keypoint and descriptor agreement, plus raw approx-vs-exact selection
    recall on the frame's TRUE FAST score distribution (the r03 check used
    synthetic uniform scores). The TPU detect_and_compute executable is the
    same one warmup needs, so this costs no extra chip compiles."""
    import sys

    import jax
    import jax.numpy as jnp
    from mageslam_tpu.ops import fast as fast_mod
    from mageslam_tpu.ops.frontend import detect_and_compute

    if jax.default_backend() != "tpu":
        return
    img = jnp.asarray(np.asarray(img_u8), jnp.float32)
    f_tpu = jax.device_get(detect_and_compute(img, sess.cam16, sess.fes,
                                              sess.N))
    cpu = jax.devices("cpu")[0]
    img_c = jax.device_put(np.asarray(img_u8).astype(np.float32), cpu)
    cam_c = jax.device_put(np.asarray(sess.cam16), cpu)
    fast_mod.FORCE_EXACT_TOPK = True
    try:
        # cpu-resident args → fresh trace → the exact branch
        f_cpu = jax.device_get(detect_and_compute(img_c, cam_c, sess.fes,
                                                  sess.N))
    finally:
        fast_mod.FORCE_EXACT_TOPK = False

    # raw selection recall on the REAL score distribution
    smap = np.asarray(jax.device_get(
        fast_mod.nms3x3(fast_mod.fast_score_map(
            img, int(sess.fes.FastThreshold))))).reshape(-1)
    k = min(2048, smap.size)
    exact_idx = np.argpartition(-smap, k - 1)[:k]
    exact_idx = set(exact_idx[smap[exact_idx] > 0].tolist())

    @jax.jit
    def approx_sel(s):
        return jax.lax.approx_max_k(s, k, recall_target=0.99)

    vals, idx = jax.device_get(approx_sel(jnp.asarray(smap)))
    approx_idx = set(idx[vals > 0].tolist())
    recall = (len(exact_idx & approx_idx) / max(len(exact_idx), 1)
              if exact_idx else 1.0)
    assert recall >= 0.97, f"frame-score approx recall {recall:.4f}"

    # keypoint agreement: every CPU-exact keypoint reproduced on TPU within
    # 1 px, and descriptors of the paired keypoints near-identical
    xy_t, ok_t = f_tpu.und_xy, f_tpu.valid
    xy_c, ok_c = f_cpu.und_xy, f_cpu.valid
    pt = xy_t[ok_t]
    pc = xy_c[ok_c]
    d2 = ((pc[:, None, :] - pt[None, :, :]) ** 2).sum(-1)     # (C, T)
    nearest = d2.argmin(1)
    hit = d2[np.arange(len(pc)), nearest] <= 1.0
    agree = hit.mean() if len(pc) else 1.0
    dt_b = f_tpu.desc[ok_t][nearest[hit]]
    dc_b = f_cpu.desc[ok_c][hit]
    xor = (dt_b ^ dc_b).view(np.uint8)
    ham = np.unpackbits(xor, axis=-1).sum(-1) if len(dt_b) else np.zeros(1)
    med_ham = float(np.median(ham))
    assert agree >= 0.92, f"frontend keypoint agreement {agree:.3f}"
    assert med_ham <= 8.0, f"median descriptor hamming {med_ham}"
    print(f"frontend parity ok: {len(pc)} exact kps, agreement "
          f"{agree:.3f}, median desc hamming {med_ham:.1f}, "
          f"frame-score approx recall {recall:.4f}", file=sys.stderr)


def main():
    import dataclasses
    import sys

    import jax
    import jax.numpy as jnp
    from mageslam_tpu.config import golden_path_settings
    from mageslam_tpu.runtime import SlamSession, TrackingState

    # persistent compile cache: executables survive across bench runs, so a
    # driver run right after a warm run pays zero relay-side compile time —
    # measured compile cost for the same executables has varied 20 s ↔ 170 s
    # with relay phase (verified working against the axon backend)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    t_start = time.perf_counter()

    def stage(msg):
        print(f"[bench +{time.perf_counter()-t_start:6.1f}s] {msg}",
              file=sys.stderr, flush=True)

    # watchdog (VERDICT r3 #2): the driver kills the bench at 570 s (rc=124,
    # no number). A single bad-phase relay compile has been measured >500 s;
    # if that lands inside a timed pass, every COMPLETED pass is still a
    # valid measurement — print the median-so-far and exit clean rather than
    # losing the round's number. Daemon thread: costs nothing when the run
    # finishes normally.
    import os
    import threading
    wd_state = {"passes": [], "tracked": 0, "timed": 0, "done": False}

    def _watchdog():
        # os._exit from here kills the process mid-relay-RPC with no cleanup;
        # an abruptly-killed TPU process can wedge the chip claim for minutes
        # (CLAUDE.md), so it is reserved for the two cases where the main
        # thread is provably stuck in a blocking relay call and the round's
        # number would otherwise be lost entirely (rc=124). ADVICE r4.
        while True:
            time.sleep(2.0)
            elapsed = time.perf_counter() - t_start
            if wd_state["done"]:
                # headline already printed — just guarantee rc=0 before the
                # driver's 570 s SIGTERM if a post-headline diagnostic stalls
                if elapsed > 548.0:
                    print("WATCHDOG: post-headline diagnostic stalled; "
                          "exiting clean", file=sys.stderr, flush=True)
                    os._exit(0)
                continue
            if elapsed > 540.0:
                p = wd_state["passes"]
                if not p or not wd_state["timed"]:
                    return      # nothing honest to report; let timeout hit
                med = float(np.median(p)) / wd_state["pass_len"]
                v = (1.0 / med) * (wd_state["tracked"] / wd_state["timed"])
                print(f"WATCHDOG: relay starved the run at +540s; reporting "
                      f"median of {len(p)} completed pass(es)",
                      file=sys.stderr, flush=True)
                print(json.dumps({
                    "metric": "tracked_fps_640x480_mono",
                    "value": round(v, 2),
                    "unit": "frames/s",
                    "vs_baseline": round(v / 30.0, 3),
                    "passes": len(p),
                    "truncated": True,
                }), flush=True)
                os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    rng = np.random.RandomState(7)
    pts, patches = build_world(rng)
    # uint8 bank: the camera-native dtype — 4× less relay upload + HBM
    # traffic per frame fetch; cores convert on device (_preprocess_image)
    bank = jax.device_put(jnp.asarray(np.stack(
        [np.clip(render(pts, patches, i * 0.033), 0, 255)
         for i in range(N_FRAMES)]).astype(np.uint8)))
    jax.block_until_ready(bank)
    stage("bank uploaded")
    ts_all = [i * 0.033 for i in range(N_FRAMES)]
    ids_all = list(range(N_FRAMES))
    cam = jnp.array([FX, FY, CX, CY], jnp.float32)
    s = golden_path_settings()
    # MinKeyframe 10→3: dispatch loop DETECTION from the first post-init
    # keyframe so (a) detect_loop compiles during warmup, never inside a
    # timed pass, and (b) the timed window carries the per-keyframe
    # loop-detection dispatch a mature map would (the detected flag rides
    # the group summary fetch — runtime/pipeline._resolve_loop_dets — so
    # this costs no blocking reads). Strictly MORE work than golden, where
    # detection would start only once 10 keyframes exist.
    s = dataclasses.replace(
        s, LoopClosureSettings=dataclasses.replace(
            s.LoopClosureSettings, MinKeyframe=3))
    sess = SlamSession(s, cam=cam, image_width=W, image_height=H)
    # deepen the flag-readback pipeline beyond the keyframe backlog default:
    # every resolve costs one full relay round trip (tens of ms through the
    # remote tunnel vs ~0.1 ms on a local chip), so the bench amortizes it
    # over 32 frames; deployments on directly-attached TPUs keep the
    # reference's MaxPendingKeyframes=4 depth
    sess._pipeline_depth = 32
    # resolve chunks in groups of 4: ONE device->host round trip per 128
    # frames. Depth does NOT delay mapping: keyframe mapping runs in-scan
    # on device at the triggering frame (pipeline._scan_frame_body);
    # resolution only surfaces results, BoW adds and loop-closure attempts
    sess._chunk_pipeline_depth = 4

    CHUNK = 32
    # warmup: per-frame ONLY until monocular init adopts (~4 frames — the
    # boot frontend + init/adopt cores), then hand straight to the stream
    # path. The sync tracking/mapping/resolution executables never compile:
    # r4 spent 220 s of relay compile on warmup frames 5-15 (sync track +
    # mapping cores + BoW retrain) that the timed passes never use
    # (VERDICT r4 #9). BoW training now pools from resolved chunks
    # (pipeline._resolve_chunks), so the retrain gate + compile land inside
    # the warm chunks below, not a timed pass.
    i = 0
    while not sess.initialized and i < WARMUP_FRAMES:
        sess.process_frame(bank[i], i * 0.033, i)
        i += 1
    stage(f"init adopted after {i} per-frame warmup frames")
    # compile the chunked stream core + resolution path pre-snapshot; TWO
    # chunks so the group-resolution path (incl. deferred loop-det flags
    # riding the fetch and the BoW retrain) also compiles/exercises before
    # timing
    sess.process_frame_stream(bank, ts_all, ids_all, start=i,
                              stop=i + 2 * CHUNK, chunk=CHUNK)
    sess.flush_chunks()
    i0 = i + 2 * CHUNK
    stage("stream warm chunks done")
    snap = sess.snapshot_state()
    kf_snap = int(np.asarray(sess.map.kf_valid).sum())
    # throwaway warm pass, identical in shape to a timed pass (restore →
    # stream the full window → flush): the workload's point count crosses
    # the small-bucket growth trigger mid-pass (pipeline bucketed banks),
    # so the first streamed window compiles the full-bucket executables +
    # the mid-pass drain shapes — 2.9 s of one-time cost that otherwise
    # lands inside timed pass 1 (measured 3.68 s vs 0.78 s for later
    # passes). Budget-gated: in a terrible relay phase, skip it and let the
    # median absorb pass 1 instead.
    if time.perf_counter() - t_start < 460:
        warm_len = ((N_FRAMES - i0) // CHUNK) * CHUNK
        sess.process_frame_stream(bank, ts_all, ids_all, start=i0,
                                  stop=i0 + warm_len, chunk=CHUNK)
        sess.flush_chunks()
        stage("throwaway warm pass done")
    sess.restore_state(snap)

    # decomposition instrumentation (VERDICT r3 #1a): split each pass into
    # resolution time (device→host group fetches — blocks on device compute,
    # so ≈ device-bound time) and per-keyframe host time (async dispatches
    # of the jitted BoW-add + loop-detect core)
    t_resolve = [0.0]
    t_kf = [0.0]
    orig_resolve = sess._resolve_chunks
    orig_post_kf = sess._post_keyframe

    def timed_resolve(count):
        t0 = time.perf_counter()
        r = orig_resolve(count)
        t_resolve[0] += time.perf_counter() - t0
        return r

    def timed_post_kf(frame, ki, fid, defer=False):
        t0 = time.perf_counter()
        r = orig_post_kf(frame, ki, fid, defer=defer)
        t_kf[0] += time.perf_counter() - t0
        return r

    sess._resolve_chunks = timed_resolve
    sess._post_keyframe = timed_post_kf

    # timed: the chunked stream (CHUNK frames per compiled dispatch — the
    # per-frame work is identical to the per-frame path, INCLUDING in-scan
    # keyframe mapping). Each pass restores the post-warmup snapshot and
    # streams the SAME 288-frame exploring window: identical keyframe
    # schedule every pass, one unhidden drain (final group fetch, a full
    # relay round trip) amortized over the whole pass. Median over 5 passes
    # rejects remote-relay stalls (CLAUDE.md: identical code has measured
    # 45-290 fps purely from relay phase).
    pass_len = ((N_FRAMES - i0) // CHUNK) * CHUNK
    tracked = timed = 0
    pass_times, pass_diags, pass_decomp = [], [], []
    # adaptive pass count: a bad relay-compile phase must not push the last
    # pass past the driver's timeout (rc≠0 → no number at all, VERDICT r3 #2)
    elapsed = time.perf_counter() - t_start
    n_passes = 5 if elapsed < 400 else (3 if elapsed < 470 else 2)
    for _ in range(n_passes):
        sess.restore_state(snap)
        t_resolve[0] = t_kf[0] = 0.0
        t0 = time.perf_counter()
        res = sess.process_frame_stream(bank, ts_all, ids_all, start=i0,
                                        stop=i0 + pass_len, chunk=CHUNK)
        res += sess.flush_chunks()
        pass_times.append(time.perf_counter() - t0)
        pass_decomp.append((t_resolve[0], t_kf[0]))
        wd_state["passes"] = list(pass_times)
        wd_state["pass_len"] = pass_len
        stage(f"pass done in {pass_times[-1]:.3f}s "
              f"(resolve {t_resolve[0]:.3f}s, kf-host {t_kf[0]:.3f}s)")
        n_trk = sum(r.state == TrackingState.TRACKING for r in res)
        n_kf_ins = sum(r.is_keyframe for r in res)
        pass_diags.append((n_trk, n_kf_ins))
        tracked += n_trk
        timed += pass_len
        wd_state["tracked"], wd_state["timed"] = tracked, timed

    print(f"pass times {['%.3f' % t for t in pass_times]} s for {pass_len} "
          f"frames; per-pass (tracked, kf inserted) {pass_diags}; "
          f"decomposition per pass (resolve_s, kf_host_s) "
          f"{[(round(a, 3), round(b, 3)) for a, b in pass_decomp]}; "
          f"keyframes at snapshot {kf_snap}, in map after last pass "
          f"{int(np.asarray(sess.map.kf_valid).sum())}; "
          f"points after last pass {int(np.asarray(sess.map.mp_valid).sum())} "
          f"(bank capacity {sess.map.capacity[:2]}); "
          f"loops_closed {sess.n_loops_closed}",
          file=sys.stderr)
    med = float(np.median(pass_times)) / pass_len
    fps = 1.0 / med if med > 0 else 0.0
    value = fps * (tracked / max(timed, 1))

    # headline FIRST, diagnostics after (ADVICE r4 medium): a bad-phase
    # diagnostic compile (295-365 s measured) after a slow warmup can stall
    # past the 570 s driver timeout; printing the number before the
    # budget-gated extras means a stalled diagnostic can no longer cost the
    # round its measurement. resolve time blocks on the device queue
    # draining, so the median pass's resolve_s / pass_len ≈ device-bound
    # ms/frame — attributes regressions to device compute vs relay phase at
    # a glance (VERDICT r4 #10).
    med_resolve = float(np.median([a for a, _ in pass_decomp]))
    print(json.dumps({
        "metric": "tracked_fps_640x480_mono",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(value / 30.0, 3),
        "device_ms_per_frame": round(med_resolve / pass_len * 1000.0, 3),
    }), flush=True)
    wd_state["done"] = True

    # kernel selfchecks AFTER the timed passes (r4): in a bad relay phase the
    # two tiny selfcheck compiles alone have cost 295-365 s — ahead of the
    # passes they starve the whole run (rc=124, no number at all, VERDICT r3
    # weak #2). They are diagnostics, not preconditions: the passes use the
    # same executables either way. Budget-gated and non-fatal.
    try:
        if time.perf_counter() - t_start < 400:
            onchip_selfchecks()
            stage("selfchecks done")
    except Exception as e:
        print(f"onchip selfchecks FAILED/SKIPPED: {e!r}", file=sys.stderr)

    # end-to-end approx-vs-exact frontend parity on a real frame (VERDICT r3
    # #6). After the passes: the TPU frontend executable already exists, so
    # this costs only the small score-map/selection compiles + one local-CPU
    # frontend trace. Budget-gated; never zeroes the headline value.
    try:
        if time.perf_counter() - t_start < 420:
            frontend_parity(sess, np.clip(render(pts, patches, i0 * 0.033),
                                          0, 255).astype(np.uint8))
            stage("frontend parity done")
    except Exception as e:      # never let a relay hiccup zero the bench
        print(f"frontend parity FAILED/SKIPPED: {e!r}", file=sys.stderr)

    # loop-closure APPLY path latency on chip (VERDICT r3 #7): the exploring
    # trajectory never revisits, so close_loop + essential graph + global BA
    # have no chip-measured cost in the passes. Time the compiled apply on
    # the final map with a constructed detection (identity correction —
    # cost is shape-driven). Budget-gated; never zeroes the headline value.
    try:
        if time.perf_counter() - t_start < 430:
            from mageslam_tpu.geometry.se3 import Pose
            from mageslam_tpu.runtime.loop_closure import LoopDetection

            ki = int(sess.last_kf_slot)
            kf_valid = np.asarray(sess.map.kf_valid)
            cluster = np.zeros_like(kf_valid)
            cluster[np.where(kf_valid)[0][:3]] = True
            # rebuild a TrackedFrame for Ki from its keyframe bank row
            from mageslam_tpu.tracking.frame_state import TrackedFrame
            frame_ki = TrackedFrame(
                pose=Pose(sess.map.kf_pose.R[ki], sess.map.kf_pose.t[ki]),
                cam=sess.map.kf_cam[ki], kp_xy=sess.map.kf_kp_xy[ki],
                kp_octave=sess.map.kf_kp_octave[ki],
                desc=sess.map.kf_desc[ki], kp_valid=sess.map.kf_kp_valid[ki],
                assoc=sess.map.kf_assoc[ki],
                timestamp=np.float32(0.0),
                frame_id=sess.map.kf_frame_id[ki])
            det = LoopDetection(
                detected=jnp.asarray(True),
                reloc_pose=Pose(sess.map.kf_pose.R[ki],
                                sess.map.kf_pose.t[ki]),
                reloc_assoc=sess.map.kf_assoc[ki],
                scale=jnp.float32(1.0),
                cluster_mask=jnp.asarray(cluster),
                kf_frame_id=sess.map.kf_frame_id,
                mp_order=sess.map.mp_created_order)
            sess._apply_loop_closure(det, frame_ki, ki)   # compile + run
            t0 = time.perf_counter()
            sess._apply_loop_closure(det, frame_ki, ki)
            dt = time.perf_counter() - t0
            stage(f"loop-closure APPLY (close_loop + essential graph + "
                  f"global BA) = {dt * 1000:.1f} ms warm")
    except Exception as e:
        print(f"loop-apply timing SKIPPED: {e!r}", file=sys.stderr)


if __name__ == "__main__":
    main()
