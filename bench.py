"""Benchmark: per-frame pipeline throughput on 640×480 monocular input.

Each timed frame runs BOTH stages of the per-frame pipeline at full budgets:
  1. the ORB frontend (pyramid/FAST/ANMS/rBRIEF) on a real rendered 640×480
     grayscale image,
  2. the tracking fast path (motion prior → guided 3-radius match →
     two-stage track-local-map pose optimization) against a live map,
plus the mapping schedule (new points + local BA + culls) whenever the
keyframe decision fires — exactly the work MAGE-SLAM does per frame.

Fully end-to-end: the frontend's features from the rendered images drive
initialization and tracking (no side-channel ground truth). Tracking
correctness is enforced: untracked frames zero out the reported value.
Frames run through the chunked stream path (32 frames per compiled
dispatch, a device-side lax.scan of the same fused per-frame step — bit-
identical to the per-frame path, tests/test_pipeline.py TestChunkedFrameLoop).

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
N_POINTS = 250
N_FRAMES = 380
WARMUP_FRAMES = 40


def build_world(rng):
    pts = np.stack([
        rng.uniform(-4, 4, N_POINTS),
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


T_WARM = 1.0   # linear travel during warmup gives init parallax


def camera_center(t):
    # linear travel until T_WARM (parallax for initialization), then oscillate
    # across the mapped region so the timed window is steady-state tracking
    base = 1.1 * min(t, T_WARM)
    osc = 0.45 * np.sin(1.2 * max(t - T_WARM, 0.0))
    return np.array([base + osc, 0.05 * np.sin(1.5 * t), 0.0], np.float32)


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
    """Correctness asserts ON THE REAL CHIP before timing (VERDICT r1 #10 /
    ADVICE r1 approx-topk): the Pallas Hamming kernel against the SWAR
    reference path, and approx_max_k candidate selection against exact
    top_k — both only take their fast form on TPU, so CI (forced-CPU) never
    exercises them where they run."""
    import sys

    import jax
    import jax.numpy as jnp
    from mageslam_tpu.ops.matching import popcount_u32

    if jax.default_backend() != "tpu":
        return
    from mageslam_tpu.ops.pallas_kernels import hamming_matrix_pallas

    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randint(0, 2**31, (512, 8)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 2**31, (448, 8)).astype(np.uint32))

    @jax.jit
    def both(a, b):
        swar = jnp.sum(popcount_u32(a[:, None, :] ^ b[None, :, :]), axis=-1)
        return hamming_matrix_pallas(a, b), swar

    d_pallas, d_swar = jax.device_get(both(a, b))
    assert (d_pallas == d_swar).all(), \
        f"pallas/SWAR mismatch: {np.abs(d_pallas - d_swar).max()}"

    scores = jnp.asarray(rng.rand(480 * 640).astype(np.float32))

    @jax.jit
    def topk(s):
        _, exact = jax.lax.top_k(s, 512)
        _, approx = jax.lax.approx_max_k(s, 512, recall_target=0.99)
        return exact, approx

    exact, approx = jax.device_get(topk(scores))
    recall = len(set(exact.tolist()) & set(approx.tolist())) / 512.0
    assert recall >= 0.97, f"approx_max_k recall {recall}"
    print(f"onchip selfchecks ok (pallas exact, approx topk recall "
          f"{recall:.3f})", file=sys.stderr)


def main():
    import jax
    import jax.numpy as jnp
    from mageslam_tpu.runtime import SlamSession, TrackingState

    onchip_selfchecks()
    rng = np.random.RandomState(7)
    pts, patches = build_world(rng)
    bank = jax.device_put(jnp.asarray(np.stack(
        [render(pts, patches, i * 0.033) for i in range(N_FRAMES)])))
    jax.block_until_ready(bank)
    ts_all = [i * 0.033 for i in range(N_FRAMES)]
    ids_all = list(range(N_FRAMES))
    cam = jnp.array([FX, FY, CX, CY], jnp.float32)
    sess = SlamSession(cam=cam, image_width=W, image_height=H)
    # deepen the flag-readback pipeline beyond the keyframe backlog default:
    # every resolve costs one full relay round trip (tens of ms through the
    # remote tunnel vs ~0.1 ms on a local chip), so the bench amortizes it
    # over 32 frames; deployments on directly-attached TPUs keep the
    # reference's MaxPendingKeyframes=4 depth
    sess._pipeline_depth = 32
    # resolve chunks in groups of 4: ONE device->host round trip per 64
    # frames (a fetch through the remote relay costs ~50 ms regardless of
    # size). Depth does NOT delay mapping: keyframe mapping runs in-scan on
    # device at the triggering frame (pipeline._scan_frame_body) — tighter
    # than the reference's MaxPendingKeyframes=4 backlog; resolution only
    # surfaces results and runs BoW adds / loop-closure attempts
    sess._chunk_pipeline_depth = 4

    CHUNK = 32
    for i in range(WARMUP_FRAMES - 5):
        sess.process_frame(bank[i], i * 0.033, i)
    # compile the fused per-frame step and the chunked stream core before
    # the timed window
    for i in range(WARMUP_FRAMES - 5, WARMUP_FRAMES):
        sess.process_frame_pipelined(bank[i], i * 0.033, i)
    sess.flush()
    sess.process_frame_stream(bank, ts_all, ids_all, start=WARMUP_FRAMES,
                              stop=WARMUP_FRAMES + CHUNK, chunk=CHUNK)

    # timed: the chunked stream (CHUNK frames per compiled dispatch — the
    # per-frame work is identical to the per-frame path, INCLUDING in-scan
    # keyframe mapping; see tests/test_pipeline.py::TestChunkedFrameLoop /
    # TestChunkedExploring for the equivalence). Each timed pass streams a
    # long continuous window and flushes at the end — every result is
    # materialized inside the timed region, and the one unhidden drain
    # (final group fetch, a full relay round trip) amortizes over the whole
    # pass instead of every 3 chunks. Median over repeated passes rejects
    # remote-relay stalls.
    i0 = WARMUP_FRAMES + CHUNK
    pass_len = ((N_FRAMES - i0) // CHUNK) * CHUNK
    tracked = timed = 0
    pass_times = []
    # 5 passes: each is ~0.5 s of device work, but the relay's latency
    # jitter (CLAUDE.md: identical code has measured 45-290 fps purely from
    # relay phase) makes a 3-sample median fragile; 5 samples reject two
    # stalled passes instead of one.
    for _ in range(5):
        t0 = time.perf_counter()
        res = sess.process_frame_stream(bank, ts_all, ids_all, start=i0,
                                        stop=i0 + pass_len, chunk=CHUNK)
        res += sess.flush_chunks()
        pass_times.append(time.perf_counter() - t0)
        tracked += sum(r.state == TrackingState.TRACKING for r in res)
        timed += pass_len

    import sys
    print(f"pass times {['%.3f' % t for t in pass_times]} s for {pass_len} "
          f"frames; keyframes in map {int(np.asarray(sess.map.kf_valid).sum())}",
          file=sys.stderr)
    med = float(np.median(pass_times)) / pass_len
    fps = 1.0 / med if med > 0 else 0.0
    value = fps * (tracked / max(timed, 1))
    print(json.dumps({
        "metric": "tracked_fps_640x480_mono",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(value / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
