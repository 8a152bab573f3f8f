"""Place-recognition precision/recall at scale for the flat online BoW
(VERDICT r4 #5).

The rebuild's deviation from the reference's vocabulary TREE
(OnlineBow::CreateVocabularyTree / QueryUnknownImage,
BoW/OnlineBow.cpp:153-255, 454-587) is a FLAT 64-word k-medoid vocabulary
(bow/vocab.py — one Hamming matmul instead of a pointer-chasing tree
descent). Single-room runs (≤150 keyframes) validate recall; this harness
measures where a flat histogram is most likely to lose the tree's
discrimination: a large multi-area map.

Map: the photoreal room rendered under several DIFFERENT texture seeds —
visually distinct "rooms" — with a full outward-looking orbit of keyframes
indexed per room (≥200 keyframes total). Queries are held-out views at
fractional orbit phases (never indexed). A candidate is CORRECT if it is in
the query's room within ±tol views of its orbit phase (genuine covisibility
neighborhood); metrics:

  top1        — precision of the best-scoring keyframe
  p_at_4      — precision among the top MaxRelocQueryResults=4 candidates
                (what detect_loop/relocalization actually consume)
  qual_recall — fraction of queries whose QUALIFYING set
                (score ≥ 0.75·max, MageSettings.h QualifyingCandidateScore)
                contains ≥1 correct keyframe
  cross_room  — fraction of queries whose top-1 lands in the WRONG room
                (the failure mode that poisons loop closure)

Usage: python -m mageslam_tpu.apps.bow_eval [--views 70] [--words 64]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def run_bow_scale_eval(views_per_room: int = 70, width: int = 320,
                       height: int = 180, num_words: int = 64,
                       query_stride: int = 6, tol: int = 5,
                       seeds=(7, 21, 42), verbose: bool = True):
    import jax
    import jax.numpy as jnp

    from ..bow.index import (add_keyframe, compute_idf, empty_index,
                             query_keyframes)
    from ..bow.vocab import train_vocabulary
    from ..config import golden_path_settings
    from ..ops.frontend import detect_and_compute
    from .render_scene import CX, CY, FX, FY, build_scene, render_frame, \
        trajectory_pose_orbit

    t0 = time.time()
    s = golden_path_settings()
    fes = s.MonoSettings.MonoCamera.FeatureExtractorSettings
    sx, sy = width / 640.0, height / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    fe = jax.jit(lambda img: detect_and_compute(
        img.astype(jnp.float32), cam, fes, max_features=512))

    n_rooms = len(seeds)
    K = n_rooms * views_per_room

    def view(surfaces, phase_i):
        R, c = trajectory_pose_orbit(phase_i, views_per_room)
        img = render_frame(surfaces, R, c, width, height,
                           frame_index=int(phase_i * 7) % 97, supersample=2)
        f = fe(jnp.asarray(img))
        return f.desc, f.valid

    kf_desc = np.zeros((K, 512, 8), np.uint32)
    kf_valid = np.zeros((K, 512), bool)
    queries = []                     # (room, phase, desc, valid)
    for room, seed in enumerate(seeds):
        surfaces = build_scene(seed, variant="loop")
        for i in range(views_per_room):
            d, v = view(surfaces, i)
            k = room * views_per_room + i
            kf_desc[k] = np.asarray(d)
            kf_valid[k] = np.asarray(v)
        for i in range(0, views_per_room, query_stride):
            d, v = view(surfaces, i + 0.5)
            queries.append((room, i + 0.5, d, v))
        if verbose:
            print(f"room {room} (seed {seed}): {views_per_room} keyframes + "
                  f"{views_per_room // query_stride} queries rendered "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    # online-vocabulary training from a spread of views across all rooms
    # (the session trains from its first TrainingFrames frames — one room;
    # training across rooms is the favorable case for the flat vocab, the
    # room-1-only variant below is the deployment-faithful case)
    pool_d = jnp.asarray(kf_desc[::7].reshape(-1, 8))
    pool_v = jnp.asarray(kf_valid[::7].reshape(-1))
    results = {}
    for name, (pd, pv) in {
        "all_rooms_vocab": (pool_d, pool_v),
        "room0_vocab": (jnp.asarray(kf_desc[:views_per_room:2].reshape(-1, 8)),
                        jnp.asarray(kf_valid[:views_per_room:2].reshape(-1))),
    }.items():
        idx = empty_index(K, num_words=num_words)
        anchors = train_vocabulary(pd, pv, jax.random.PRNGKey(0),
                                   num_words=num_words)
        idx = idx._replace(anchors=anchors, trained=jnp.asarray(True))
        idx = compute_idf(idx, pd, pv)
        add = jax.jit(add_keyframe)
        for k in range(K):
            idx = add(idx, jnp.int32(k), jnp.asarray(kf_desc[k]),
                      jnp.asarray(kf_valid[k]))
        q_jit = jax.jit(lambda d, v, idx=idx: query_keyframes(idx, d, v))

        top1 = p4 = qual_rec = cross = 0
        for room, phase, d, v in queries:
            scores, qualified = q_jit(d, v)
            scores = np.asarray(scores)
            order = np.argsort(-scores)

            def correct(k):
                r, i = divmod(int(k), views_per_room)
                dphase = abs(i - phase)
                dphase = min(dphase, views_per_room - dphase)  # circular
                return r == room and dphase <= tol

            top1 += correct(order[0])
            cross += (order[0] // views_per_room) != room
            p4 += np.mean([correct(k) for k in order[:4]])
            qual = np.where(np.asarray(qualified))[0]
            qual_rec += any(correct(k) for k in qual)
        nq = len(queries)
        results[name] = {
            "top1": top1 / nq, "p_at_4": p4 / nq,
            "qual_recall": qual_rec / nq, "cross_room": cross / nq,
        }
        if verbose:
            print(f"{name}: {results[name]} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    results["keyframes"] = K
    results["queries"] = len(queries)
    results["elapsed_s"] = time.time() - t0
    return results


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--views", type=int, default=70)
    p.add_argument("--words", type=int, default=64)
    p.add_argument("--stride", type=int, default=6)
    args = p.parse_args()
    r = run_bow_scale_eval(views_per_room=args.views, num_words=args.words,
                           query_stride=args.stride)
    print(r)


if __name__ == "__main__":
    main()
