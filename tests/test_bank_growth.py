"""Bucketed bank-capacity growth (worldmap.map_state.grow_map).

Sessions start in a small keyframe/point bucket — every (K,·)/(P,·) op in
tracking and mapping scales with bank capacity, so a young map stops
paying full-Budgets FLOPs (measured on chip: the P=8192 padding dominated
the per-frame tracking pass at <1k live points) — and pad-copy into the
full Budgets capacity when live counts approach the bucket
(SlamSession._maybe_grow_banks / _service_bank_growth). This is the TPU
analog of the reference's growing std::vector state (Map.cpp containers):
fixed shapes per bucket, one retrace per crossing."""

import numpy as np
import jax.numpy as jnp

from mageslam_tpu.worldmap.covisibility import covisibility_matrix
from mageslam_tpu.worldmap.map_state import grow_map, refresh_membership

from test_loop_closure import build_drifted_map


def test_grow_map_preserves_state(rng):
    m, bow, frames, pts, descs, n_pts = build_drifted_map(rng)
    m2 = grow_map(m, 64, 1024)
    assert m2.capacity == (64, 1024, 64)
    # live slots copied verbatim, ids preserved
    np.testing.assert_array_equal(np.asarray(m2.mp_pos[:256]),
                                  np.asarray(m.mp_pos))
    np.testing.assert_array_equal(np.asarray(m2.kf_assoc[:16]),
                                  np.asarray(m.kf_assoc))
    np.testing.assert_array_equal(np.asarray(m2.kf_pose.t[:16]),
                                  np.asarray(m.kf_pose.t))
    # appended slots carry the empty-map fill values
    assert not bool(m2.kf_valid[16:].any())
    assert not bool(m2.mp_valid[256:].any())
    assert int(m2.kf_frame_id[20]) == -1
    assert int(m2.mp_created_order[300]) == -1
    # derived structures agree: membership cache matches its rebuild, and
    # covisibility over the original region is unchanged
    m3 = refresh_membership(m2)
    np.testing.assert_array_equal(np.asarray(m3.kf_member),
                                  np.asarray(m2.kf_member))
    np.testing.assert_array_equal(
        np.asarray(covisibility_matrix(m2))[:16, :16],
        np.asarray(covisibility_matrix(m)))


def test_grow_index_preserves_rows(rng):
    from mageslam_tpu.bow.index import grow_index

    _, bow, *_ = build_drifted_map(rng)
    b2 = grow_index(bow, 64)
    np.testing.assert_array_equal(np.asarray(b2.kf_vectors[:16]),
                                  np.asarray(bow.kf_vectors))
    assert not bool(b2.kf_has[16:].any())
    assert b2.num_words == bow.num_words


def test_mid_stream_bucket_crossing():
    """Force a growth mid-chunked-stream: the session must drain in-flight
    chunks, grow to full Budgets capacity (map + BoW rows), and keep
    tracking across the crossing (validated 2026-08-20: 65/70 tracked with
    the crossing at mid-sequence, finite fossilized poses)."""
    from mageslam_tpu.apps.render_scene import CX, CY, FX, FY, render_sequence
    from mageslam_tpu.runtime import SlamSession, TrackingState

    W, H = 320, 180
    sx, sy = W / 640.0, H / 480.0
    cam = jnp.array([FX * sx, FY * sy, CX * sx, CY * sy], jnp.float32)
    sess = SlamSession(cam=cam, image_width=W, image_height=H)
    assert sess.map.capacity[0] < sess.settings.Budgets.MaxKeyframes
    N = 72
    frames = list(render_sequence(N, W, H, trajectory="sweep"))
    i = 0
    while not sess.initialized and i < 20:
        sess.process_frame(frames[i][0].astype(np.float32),
                           frames[i][1], frames[i][2])
        i += 1
    CH = 8
    half = i + ((N - i) // 2 // CH) * CH
    while i + CH <= half:
        sess.process_frames_chunked(
            [f[0].astype(np.float32) for f in frames[i:i + CH]],
            [f[1] for f in frames[i:i + CH]],
            [f[2] for f in frames[i:i + CH]])
        i += CH
    sess._grow_pending = True          # force the crossing mid-stream
    while i + CH <= N:
        sess.process_frames_chunked(
            [f[0].astype(np.float32) for f in frames[i:i + CH]],
            [f[1] for f in frames[i:i + CH]],
            [f[2] for f in frames[i:i + CH]])
        i += CH
    sess.flush_chunks()
    b = sess.settings.Budgets
    assert sess.map.capacity[:2] == (b.MaxKeyframes, b.MaxMapPoints)
    assert sess.bow.kf_has.shape[0] == b.MaxKeyframes
    ids, mats = sess.fossilize()
    states = [r.state for r in sess.results]
    tracked = sum(s == TrackingState.TRACKING for s in states)
    assert tracked >= 0.8 * len(states), (tracked, len(states))
    assert np.isfinite(np.asarray(mats)).all()
