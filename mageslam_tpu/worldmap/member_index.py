"""Indexed membership: the (K, P) feature-index form of the membership matrix.

`fidx[k, p]` = the feature index of keyframe k's observation of point p, or
-1. It subsumes the bool membership matrix (`member = fidx >= 0`) while also
answering "WHICH feature observes p" — the query `refresh_point_stats_slots`,
`cull_local_keyframes` (octave histogram) and `apply_ba_results` (observer
counts) each re-derived from the raw association matrix with a fresh
131k-update scatter.

On the real chip that scatter costs ~1.3 ms and the round-4 stage
decomposition (tools/prof_mapping.py) counted ~9 of them per mapping event —
more than a third of the whole 35 ms mapping core. Building fidx ONCE per
event and updating it incrementally at each map mutation (row rebuilds on
insert/association, column clears on point removal — all O(N) or elementwise)
replaces them with gathers and masks.

Invariant (matches the reference): a keyframe observes a map point through at
most ONE feature — Map::AddAssociation asserts uniqueness and
merge_map_points explicitly drops duplicate associations. Where two features
of one keyframe could transiently reference one point, fidx keeps the LOWEST
feature index, exactly like the membership/feature derivations it replaces
(point_keyframe_matrix's first-hit argmax, refresh_point_stats_slots'
min-scatter).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .map_state import MapState

INVALID = jnp.int32(-1)


def build_fidx(state: MapState) -> jax.Array:
    """(K, P) int32 from the association matrix — the one full scatter."""
    K, P, N = state.capacity
    assoc = state.kf_assoc
    valid = (assoc >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    rows = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    cols = jnp.where(valid, assoc, P)
    feats = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N))
    fidx = jnp.full((K, P), N, jnp.int32).at[rows, cols].min(feats,
                                                             mode="drop")
    return jnp.where(fidx >= N, INVALID, fidx)


def fidx_set_row(fidx: jax.Array, k: jax.Array, assoc_row: jax.Array,
                 kp_valid: jax.Array) -> jax.Array:
    """Rebuild row k from a fresh association row (keyframe insert, or any
    whole-row association rewrite). O(N) scatter."""
    K, P = fidx.shape
    N = assoc_row.shape[0]
    ok = (assoc_row >= 0) & kp_valid
    row = jnp.full((P,), N, jnp.int32).at[
        jnp.where(ok, assoc_row, P)
    ].min(jnp.arange(N, dtype=jnp.int32), mode="drop")
    row = jnp.where(row >= N, INVALID, row)
    return fidx.at[k].set(row)


def fidx_set_rows(fidx: jax.Array, ks: jax.Array, assoc_rows: jax.Array,
                  kp_valid_rows: jax.Array, ok_rows: jax.Array,
                  kf_valid: jax.Array | None = None) -> jax.Array:
    """Rebuild a small batch of rows (F,) from association rows (F, N);
    rows with ok_rows[f] False keep their old contents. ks must be distinct
    where ok (callers pass argsort slices). kf_valid (K,) folds the keyframe
    validity factor build_fidx applies — without it correctness relies on
    the invariant that invalid keyframes carry fully cleared kf_assoc rows
    (true for every current caller via remove_keyframes/empty_map, but a
    latent hazard for new ones; ADVICE r4)."""
    K, P = fidx.shape
    kfv = (jnp.ones_like(ok_rows) if kf_valid is None
           else kf_valid[jnp.clip(ks, 0, K - 1)])

    def one(k, row, kpv, ok, kv):
        N = row.shape[0]
        okm = (row >= 0) & kpv & ok & kv
        r = jnp.full((P,), N, jnp.int32).at[
            jnp.where(okm, row, P)
        ].min(jnp.arange(N, dtype=jnp.int32), mode="drop")
        return jnp.where(r >= N, INVALID, r)

    rows = jax.vmap(one)(ks, assoc_rows, kp_valid_rows, ok_rows, kfv)  # (F, P)
    keep = jnp.where(ok_rows[:, None], rows,
                     fidx[jnp.where(ok_rows, ks, 0)])
    return fidx.at[jnp.where(ok_rows, ks, K)].set(keep, mode="drop")


def fidx_add(fidx: jax.Array, ks: jax.Array, feats: jax.Array,
             points: jax.Array, want: jax.Array) -> jax.Array:
    """Add individual associations (k, feat) -> point. O(M) scatter."""
    K, P = fidx.shape
    kw = jnp.where(want, ks, K)
    pw = jnp.where(want, points, 0)
    return fidx.at[kw, pw].set(feats.astype(jnp.int32), mode="drop")


def fidx_remove_obs(fidx: jax.Array, ks: jax.Array, points: jax.Array,
                    want: jax.Array) -> jax.Array:
    """Clear individual associations (k, point). O(M) scatter."""
    K, P = fidx.shape
    kw = jnp.where(want, ks, K)
    pw = jnp.where(want, points, 0)
    return fidx.at[kw, pw].set(INVALID, mode="drop")


def fidx_remove_points(fidx: jax.Array, removed: jax.Array) -> jax.Array:
    """Clear the columns of removed points (P,) bool. Elementwise."""
    return jnp.where(removed[None, :], INVALID, fidx)


def fidx_remove_keyframes(fidx: jax.Array, removed: jax.Array) -> jax.Array:
    """Clear the rows of removed keyframes (K,) bool. Elementwise."""
    return jnp.where(removed[:, None], INVALID, fidx)


def member_of(fidx: jax.Array) -> jax.Array:
    """(K, P) bool membership view."""
    return fidx >= 0


def octave_histogram_of(fidx: jax.Array, kf_kp_octave: jax.Array,
                        num_levels: int) -> jax.Array:
    """(P, L) per-point observation count by pyramid level — the
    point_octave_histogram query without its 131k-update scatter: gather the
    observing feature's octave per (k, p), then L masked column sums."""
    K, P = fidx.shape
    safe = jnp.where(fidx >= 0, fidx, 0)
    octv = jnp.take_along_axis(kf_kp_octave, safe, axis=1)            # (K, P)
    octv = jnp.clip(octv, 0, num_levels - 1)
    okt = jnp.where(fidx >= 0, octv, -1)
    hist = jnp.stack(
        [jnp.sum((okt == l).astype(jnp.int32), axis=0)
         for l in range(num_levels)], axis=1)                         # (P, L)
    return hist
