import cv2
import jax.numpy as jnp
import numpy as np

from mageslam_tpu.ops import matching


def rand_desc(rng, n):
    return rng.randint(0, 2**32, size=(n, 8), dtype=np.uint64).astype(np.uint32)


def np_hamming(a, b):
    abits = np.unpackbits(a.view(np.uint8), axis=1)
    bbits = np.unpackbits(b.view(np.uint8), axis=1)
    return (abits[:, None, :] != bbits[None, :, :]).sum(-1)


def test_popcount(rng):
    v = rng.randint(0, 2**32, size=(1000,), dtype=np.uint64).astype(np.uint32)
    ours = np.asarray(matching.popcount_u32(jnp.asarray(v)))
    ref = np.array([bin(int(x)).count("1") for x in v])
    np.testing.assert_array_equal(ours, ref)


def test_hamming_matrix_both_paths(rng):
    a, b = rand_desc(rng, 64), rand_desc(rng, 48)
    ref = np_hamming(a, b)
    swar = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b), use_mxu=False))
    mxu = np.asarray(matching.hamming_matrix(jnp.asarray(a), jnp.asarray(b), use_mxu=True))
    np.testing.assert_array_equal(swar, ref)
    np.testing.assert_array_equal(mxu, ref)


def test_match_two_way_vs_bfmatcher_crosscheck(rng):
    a, b = rand_desc(rng, 80), rand_desc(rng, 90)
    # plant 30 near-identical pairs (flip 2 bits)
    for i in range(30):
        b[i] = a[i]
        b[i, 0] ^= np.uint32(3)
    idx, dist = matching.match_two_way(
        jnp.asarray(a), jnp.ones(80, bool), jnp.asarray(b), jnp.ones(90, bool),
        max_hamming=30, min_diff=1,
    )
    idx = np.asarray(idx)
    # oracle: mutual best with <=30 gate and second-best >= best+1
    H = np_hamming(a, b).astype(np.int64)
    Ht = np.where(H <= 30, H, 10**6)
    for q in range(80):
        row = Ht[q]
        best = row.argmin()
        srt = np.sort(row)
        fwd_ok = srt[0] < 10**6 and (srt[1] >= 10**6 or srt[1] - srt[0] >= 1)
        col = Ht[:, best]
        csrt = np.sort(col)
        bwd_ok = csrt[0] < 10**6 and (csrt[1] >= 10**6 or csrt[1] - csrt[0] >= 1)
        mutual = col.argmin() == q
        expected = best if (fwd_ok and bwd_ok and mutual) else -1
        assert idx[q] == expected, (q, idx[q], expected)
    assert (idx[:30] == np.arange(30)).mean() > 0.9


def test_match_respects_validity(rng):
    a, b = rand_desc(rng, 16), rand_desc(rng, 16)
    b[:] = a  # perfect matches
    valid_b = np.zeros(16, bool)
    idx, _ = matching.match_two_way(
        jnp.asarray(a), jnp.ones(16, bool), jnp.asarray(b), jnp.asarray(valid_b),
        max_hamming=30, min_diff=1,
    )
    assert (np.asarray(idx) == -1).all()


def test_radius_match_box_and_octave(rng):
    n, m = 8, 32
    qd = rand_desc(rng, n)
    td = np.tile(qd, (4, 1))  # 4 copies of each query desc
    q_xy = np.array([[100.0 + 20 * i, 100.0] for i in range(n)], np.float32)
    # copy 0: close, same octave (should match)
    # copy 1: outside radius; copy 2: different octave; copy 3: close but 5-bit flipped
    t_xy = np.concatenate([
        q_xy + [3, 3],
        q_xy + [50, 0],
        q_xy + [2, 2],
        q_xy + [1, 1],
    ]).astype(np.float32)
    t_oct = np.concatenate([np.zeros(n), np.zeros(n), np.ones(n), np.zeros(n)]).astype(np.int32)
    for i in range(n):
        td[3 * n + i, 1] ^= np.uint32(0b11111)
    idx, dist = matching.radius_match(
        jnp.asarray(qd), jnp.asarray(q_xy), jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        jnp.asarray(td), jnp.asarray(t_xy), jnp.asarray(t_oct), jnp.ones(4 * n, bool),
        radius=jnp.float32(8.0), max_hamming=jnp.int32(30), min_diff=jnp.int32(1),
    )
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx, np.arange(n))  # copy 0 wins (dist 0 vs 5)
    assert (np.asarray(dist) == 0).all()


def test_radius_match_ambiguity_gate(rng):
    # two identical targets in radius -> second == best -> rejected
    qd = rand_desc(rng, 4)
    td = np.concatenate([qd, qd])
    q_xy = np.array([[50.0, 50 + 40 * i] for i in range(4)], np.float32)
    t_xy = np.concatenate([q_xy + [1, 0], q_xy + [2, 0]]).astype(np.float32)
    idx, _ = matching.radius_match(
        jnp.asarray(qd), jnp.asarray(q_xy), jnp.zeros(4, jnp.int32), jnp.ones(4, bool),
        jnp.asarray(td), jnp.asarray(t_xy), jnp.zeros(8, jnp.int32), jnp.ones(8, bool),
        radius=jnp.float32(8.0), max_hamming=jnp.int32(30), min_diff=jnp.int32(1),
    )
    assert (np.asarray(idx) == -1).all()


def test_per_query_radius(rng):
    qd = rand_desc(rng, 2)
    td = qd.copy()
    q_xy = np.array([[50.0, 50.0], [150.0, 50.0]], np.float32)
    t_xy = q_xy + [10, 0]
    radius = jnp.asarray(np.array([5.0, 12.0], np.float32))  # only query 1 reaches
    idx, _ = matching.radius_match(
        jnp.asarray(qd), jnp.asarray(q_xy), jnp.zeros(2, jnp.int32), jnp.ones(2, bool),
        jnp.asarray(td), jnp.asarray(t_xy), jnp.zeros(2, jnp.int32), jnp.ones(2, bool),
        radius=radius, max_hamming=jnp.int32(30), min_diff=jnp.int32(1),
    )
    assert list(np.asarray(idx)) == [-1, 1]
