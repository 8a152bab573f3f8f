"""MapState: keyframe + map point banks as one pytree of padded arrays.

The reference's model state is a pointer graph (Map/Map.h: Keyframe* /
MapPoint* with bidirectional association lists). TPU-first it becomes:

  - keyframe bank, capacity K (Budgets.MaxKeyframes)
  - map point bank, capacity P (Budgets.MaxMapPoints)
  - one (K, N) association matrix: feature slot → map point slot or -1
    (Containers/MapPointAssociations.{h,cpp} kept two hash maps + masks;
    the matrix IS both directions: row read = keyframe's points, masked
    column scan = point's keyframes)

Derived structures (membership/covisibility, per-point octave histograms,
mean view directions) are recomputed by batched reductions when needed —
cheaper on TPU than maintaining the reference's incremental caches
(MapPoint.cpp m_octaveCounters, CovisibilityGraph's sparse adjacency).

Map point statistics mirror MapPoint::UpdateMeanViewDirectionAndDistances and
UpdateRepresentativeDescriptor (Map/MapPoint.cpp:80-160), with dMin/dMax from
Map/MappingMath.h:32-41.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose

INVALID = jnp.int32(-1)


class MapState(NamedTuple):
    """All SLAM map state. K keyframe slots, P point slots, N feature slots."""

    # --- keyframes ---
    kf_valid: jax.Array      # (K,) bool
    kf_fixed: jax.Array      # (K,) bool — fixed in BA (externally tethered)
    kf_immortal: jax.Array   # (K,) bool — never culled (init keyframes; Keyframe::IsImmortal)
    kf_pose: Pose            # R (K,3,3), t (K,3) world→camera
    kf_cam: jax.Array        # (K, 4) fx,fy,cx,cy — undistorted pinhole (matching/BA space)
    kf_frame_id: jax.Array   # (K,) int32 source frame id
    kf_order: jax.Array      # (K,) int32 insertion sequence number (monotonic)

    # per-keyframe features (from FrameFeatures)
    kf_kp_xy: jax.Array      # (K, N, 2) f32 undistorted pixel coords
    kf_kp_octave: jax.Array  # (K, N) int32
    kf_desc: jax.Array       # (K, N, 8) uint32 rBRIEF
    kf_kp_valid: jax.Array   # (K, N) bool
    kf_assoc: jax.Array      # (K, N) int32 → point slot, or -1
    # (K, P) bool membership cache: keyframe k observes point p. Associations
    # only ever change inside the mapping/loop-closure cores, so those
    # refresh it once per pass (refresh_membership) and the per-frame hot
    # path reads it as two MXU matvecs instead of (K, N) index gathers —
    # the gather form cost ~1.8 ms/frame on v5e.
    kf_member: jax.Array

    # --- map points ---
    mp_valid: jax.Array          # (P,) bool
    mp_pos: jax.Array            # (P, 3) f32 world position
    mp_desc: jax.Array           # (P, 8) uint32 representative descriptor
    mp_mean_dir: jax.Array       # (P, 3) f32 mean viewing direction (unit)
    mp_dmin: jax.Array           # (P,) f32 min valid viewing distance
    mp_dmax: jax.Array           # (P,) f32 max valid viewing distance
    mp_refine_count: jax.Array   # (P,) int32 — BA refinements (information scaling)
    mp_created_order: jax.Array  # (P,) int32 — kf_order epoch at creation (recent-culling)
    mp_found: jax.Array          # (P,) int32 — times found by tracking (TrackLocalMap.cpp:68-86)
    mp_predicted: jax.Array      # (P,) int32 — times predicted visible

    # --- keyframe tethers (Data/Tether.h:12-68) ---
    # Persisted spatial constraints between keyframe pairs, re-assembled into
    # every BA window (BundleAdjust.cpp:57-119). The reference stores them on
    # the owning keyframe; here one small bank holds (owner, origin) pairs.
    tether_owner: jax.Array      # (T,) int32 owning keyframe slot (DestinationIdx)
    tether_origin: jax.Array     # (T,) int32 the other keyframe (OriginIdx)
    tether_kind: jax.Array       # (T,) int32 ba.problem.TETHER_* kind
    tether_pose: Pose            # (T,) measured origin→owner view-delta T_o∘T_g⁻¹
    tether_distance: jax.Array   # (T,) f32 (DISTANCE kind)
    tether_weight: jax.Array     # (T,) f32; 0 = free slot

    # --- counters ---
    next_order: jax.Array        # () int32 — next keyframe insertion sequence number

    @property
    def capacity(self) -> tuple[int, int, int]:
        K, N = self.kf_assoc.shape
        return K, self.mp_valid.shape[0], N

    def keyframe_centers(self) -> jax.Array:
        """(K, 3) camera centers in world space."""
        return self.kf_pose.center()


def empty_map(max_keyframes: int, max_points: int, max_features: int,
              max_tethers: int = 16) -> MapState:
    K, P, N = max_keyframes, max_points, max_features
    T = max_tethers
    return MapState(
        tether_owner=jnp.full((T,), -1, jnp.int32),
        tether_origin=jnp.full((T,), -1, jnp.int32),
        tether_kind=jnp.zeros((T,), jnp.int32),
        tether_pose=Pose.identity((T,)),
        tether_distance=jnp.ones((T,), jnp.float32),
        tether_weight=jnp.zeros((T,), jnp.float32),
        kf_valid=jnp.zeros((K,), bool),
        kf_fixed=jnp.zeros((K,), bool),
        kf_immortal=jnp.zeros((K,), bool),
        kf_pose=Pose.identity((K,)),
        kf_cam=jnp.tile(jnp.array([[1.0, 1.0, 0.0, 0.0]], jnp.float32), (K, 1)),
        kf_frame_id=jnp.full((K,), -1, jnp.int32),
        kf_order=jnp.full((K,), -1, jnp.int32),
        kf_kp_xy=jnp.zeros((K, N, 2), jnp.float32),
        kf_kp_octave=jnp.zeros((K, N), jnp.int32),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_assoc=jnp.full((K, N), INVALID, jnp.int32),
        kf_member=jnp.zeros((K, P), bool),
        mp_valid=jnp.zeros((P,), bool),
        mp_pos=jnp.zeros((P, 3), jnp.float32),
        mp_desc=jnp.zeros((P, 8), jnp.uint32),
        mp_mean_dir=jnp.zeros((P, 3), jnp.float32),
        mp_dmin=jnp.zeros((P,), jnp.float32),
        mp_dmax=jnp.zeros((P,), jnp.float32),
        mp_refine_count=jnp.zeros((P,), jnp.int32),
        mp_created_order=jnp.full((P,), -1, jnp.int32),
        mp_found=jnp.zeros((P,), jnp.int32),
        mp_predicted=jnp.zeros((P,), jnp.int32),
        next_order=jnp.int32(0),
    )


def grow_map(ms: MapState, max_keyframes: int, max_points: int) -> MapState:
    """Copy the map into larger keyframe/point banks (bucketed capacity
    growth — the TPU analog of the reference's std::vector growth: fixed
    shapes per bucket, one pad-copy dispatch at the crossing). Slot ids are
    preserved (capacity only APPENDS empty slots), so kf_assoc point ids,
    pose-history keyframe connections and BoW rows all stay valid. New
    slots carry exactly empty_map's fill values."""
    K, P, N = ms.capacity
    K2, P2 = max_keyframes, max_points
    assert K2 >= K and P2 >= P, (ms.capacity, K2, P2)
    base = empty_map(K2, P2, N, max_tethers=ms.tether_owner.shape[0])

    def pad_into(empty_leaf, leaf):
        if empty_leaf.shape == leaf.shape:
            return leaf
        return jax.lax.dynamic_update_slice(
            empty_leaf, leaf.astype(empty_leaf.dtype),
            (0,) * leaf.ndim)

    return jax.tree.map(pad_into, base, ms)


def compute_dmin_dmax(distance: jax.Array, octave: jax.Array, num_levels: int,
                      scale_factor: float) -> tuple[jax.Array, jax.Array]:
    """Scale-invariance viewing range (Map/MappingMath.h:32-41): the half-octave
    offset models 'best matches are near the target octave'."""
    oct_f = octave.astype(jnp.float32)
    dmax = distance * scale_factor ** (num_levels - (oct_f + 0.5))
    dmin = distance * scale_factor ** (-(oct_f + 0.5))
    return dmin, dmax


def predict_octave(distance: jax.Array, dmin: jax.Array, scale_factor: float) -> jax.Array:
    """ComputeOctave (MappingMath.h:13-16): expected pyramid level when viewing
    a point from `distance` given its dMin."""
    ratio = jnp.maximum(distance / jnp.maximum(dmin, 1e-12), 1e-12)
    return jnp.round(
        jnp.log2(ratio) / jnp.log2(jnp.float32(scale_factor)) - 0.5
    ).astype(jnp.int32)


def refinement_confidence(refine_count: jax.Array) -> jax.Array:
    """MapPointRefinementConfidence (MappingMath.h:43-50): observation
    information scaling approaching 1 after ~5 refinements."""
    rc = refine_count.astype(jnp.float32)
    return 1.0 - 1.0 / (1.5 + rc) ** 2


def point_keyframe_matrix(state: MapState) -> jax.Array:
    """(K, P) bool membership: keyframe k observes point p. One scatter from the
    association matrix — the derived form of MapPoint::GetKeyframes()."""
    K, P, N = state.capacity
    assoc = state.kf_assoc
    valid = (assoc >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    pt = jnp.where(valid, assoc, 0)
    member = jnp.zeros((K, P), bool)
    rows = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    return member.at[rows, pt].max(valid)


def refresh_membership(state: MapState) -> MapState:
    """Recompute the (K, P) membership cache from the association matrix.
    Call at the end of every pass that mutates associations (mapping core,
    loop closure, map adoption); the tracking hot path only reads it."""
    return state._replace(kf_member=point_keyframe_matrix(state))


def point_octave_histogram(state: MapState, num_levels: int) -> jax.Array:
    """(P, L) int32: per map point, how many observing keyframes see it at each
    pyramid level (MapPoint m_octaveCounters, MapPoint.h:124-131 — derived here)."""
    K, P, N = state.capacity
    assoc = state.kf_assoc
    valid = (assoc >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    pt = jnp.where(valid, assoc, 0).reshape(-1)
    octv = jnp.clip(state.kf_kp_octave, 0, num_levels - 1).reshape(-1)
    hist = jnp.zeros((P, num_levels), jnp.int32)
    return hist.at[pt, octv].add(valid.reshape(-1).astype(jnp.int32))


def observation_counts(state: MapState) -> jax.Array:
    """(P,) int32 — number of keyframes observing each point."""
    return jnp.sum(point_keyframe_matrix(state).astype(jnp.int32), axis=0)


def refresh_point_stats(state: MapState, touched: jax.Array, num_levels: int,
                        scale_factor: float, max_obs_kf: int = 16) -> MapState:
    """Recompute mean view direction, representative descriptor and dMin/dMax
    for points flagged in `touched` (P,) bool.

    Mirrors MapPoint::UpdateRepresentativeDescriptor (medoid descriptor over
    observing keyframes, MapPoint.cpp:80-131) and
    UpdateMeanViewDirectionAndDistances (MapPoint.cpp:133-160). The medoid is
    computed over the first `max_obs_kf` observing keyframes (insertion order) —
    a bounded-budget deviation; points are rarely seen by >16 keyframes and the
    medoid is only used to pick a "typical" descriptor.
    """
    from ..ops.matching import popcount_u32

    K, P, N = state.capacity
    max_obs_kf = min(max_obs_kf, K)   # tiny-budget maps (e.g. dryrun) have K < 16
    member = point_keyframe_matrix(state)                     # (K, P)
    n_obs = jnp.sum(member.astype(jnp.int32), axis=0)         # (P,)

    # mean viewing direction: normalize( Σ_k normalize(pos_p - C_k) )
    centers = state.keyframe_centers()                        # (K, 3)
    delta = state.mp_pos[None, :, :] - centers[:, None, :]    # (K, P, 3)
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    unit = delta / jnp.maximum(norm, 1e-12)
    mean_dir = jnp.sum(jnp.where(member[..., None], unit, 0.0), axis=0)
    mean_dir = mean_dir / jnp.maximum(jnp.linalg.norm(mean_dir, axis=-1, keepdims=True), 1e-12)

    # top max_obs_kf observing keyframes per point (by keyframe slot order)
    # score: valid → kf slot index, invalid → K (sorted to the back)
    obs_rank = jnp.where(member, jnp.arange(K, dtype=jnp.int32)[:, None], K)
    top_kf = jnp.argsort(obs_rank, axis=0)[:max_obs_kf].T      # (P, max_obs_kf)
    top_ok = jnp.take_along_axis(member.T, top_kf, axis=1)     # (P, max_obs_kf)

    # each observing keyframe's feature index for this point: argmax over the
    # association row (assoc[k] == p)
    # gather per (p, j): feature index where kf_assoc[top_kf] == p
    def feat_index(kf_idx, p_idx):
        row = state.kf_assoc[kf_idx]                           # (N,)
        hit = row == p_idx
        return jnp.argmax(hit).astype(jnp.int32), jnp.any(hit)

    p_ids = jnp.arange(P, dtype=jnp.int32)[:, None].repeat(max_obs_kf, axis=1)
    feat_idx, feat_ok = jax.vmap(jax.vmap(feat_index))(top_kf, p_ids)
    ok = top_ok & feat_ok                                      # (P, max_obs_kf)

    descs = state.kf_desc[top_kf, feat_idx]                    # (P, J, 8) uint32
    octaves = state.kf_kp_octave[top_kf, feat_idx]             # (P, J)

    # medoid: minimize summed Hamming distance to the others
    x = descs[:, :, None, :] ^ descs[:, None, :, :]            # (P, J, J, 8)
    d = jnp.sum(popcount_u32(x), axis=-1)                      # (P, J, J)
    pair_ok = ok[:, :, None] & ok[:, None, :]
    summed = jnp.sum(jnp.where(pair_ok, d, 0), axis=-1)        # (P, J)
    summed = jnp.where(ok, summed, jnp.iinfo(jnp.int32).max)
    rep = jnp.argmin(summed, axis=-1)                          # (P,)
    rep_desc = jnp.take_along_axis(descs, rep[:, None, None], axis=1)[:, 0]
    rep_kf = jnp.take_along_axis(top_kf, rep[:, None], axis=1)[:, 0]
    rep_oct = jnp.take_along_axis(octaves, rep[:, None], axis=1)[:, 0]

    # dMin/dMax from the representative keyframe's distance + octave
    rep_center = centers[rep_kf]                               # (P, 3)
    dist = jnp.linalg.norm(state.mp_pos - rep_center, axis=-1)
    dmin, dmax = compute_dmin_dmax(dist, rep_oct, num_levels, scale_factor)

    upd = touched & state.mp_valid & (n_obs > 0)
    return state._replace(
        mp_mean_dir=jnp.where(upd[:, None], mean_dir, state.mp_mean_dir),
        mp_desc=jnp.where(upd[:, None], rep_desc, state.mp_desc),
        mp_dmin=jnp.where(upd, dmin, state.mp_dmin),
        mp_dmax=jnp.where(upd, dmax, state.mp_dmax),
    )


def refresh_point_stats_slots(state: MapState, slots: jax.Array,
                              num_levels: int, scale_factor: float,
                              max_obs_kf: int = 16,
                              fidx: jax.Array | None = None) -> MapState:
    """`refresh_point_stats` restricted to an explicit (S,) int32 slot list
    (-1 padded): identical math, but every intermediate is (K, S) / (S, ...)
    instead of (K, P) / (P, ...).

    The hot mapping paths only ever touch a bounded set of points per
    keyframe (new creations ≤ MaxFeatures, BA window ≤ MaxBaPoints), yet the
    full-bank refresh pays K×P work — measured 12.4 ms of the 44.9 ms
    mapping core on the real chip (apply_ba_results alone). This variant is
    the same MapPoint::UpdateRepresentativeDescriptor /
    UpdateMeanViewDirectionAndDistances semantics (MapPoint.cpp:80-160) at
    S/P the cost; tests assert bit-parity against the full-bank version.
    Duplicate valid slots are not allowed (each map point occupies one slot).
    """
    from ..ops.matching import popcount_u32

    K, P, N = state.capacity
    max_obs_kf = min(max_obs_kf, K)   # tiny-budget maps (e.g. dryrun) have K < 16
    S = slots.shape[0]
    ok_s = (slots >= 0) & (slots < P)
    slot_safe = jnp.where(ok_s, slots, 0)

    if fidx is not None:
        # threaded feature-index membership (worldmap/member_index.py):
        # the (K, S) views are column GATHERS instead of two 131k-update
        # scatters (~2.6 ms of the mapping core on chip)
        feat_s = jnp.take(fidx, slot_safe, axis=1)             # (K, S)
        feat_s = jnp.where(ok_s[None, :], feat_s, -1)
        member_s = feat_s >= 0
    else:
        # inverse map p → s (out-of-bounds scatter drops the padding)
        s_of_p = jnp.full((P,), -1, jnp.int32).at[
            jnp.where(ok_s, slots, P)
        ].set(jnp.arange(S, dtype=jnp.int32), mode="drop")

        # (K, S) membership + observing feature index, from associations
        assoc = state.kf_assoc                                 # (K, N)
        valid = (assoc >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
        a_safe = jnp.where(valid, assoc, 0)
        s_tgt = jnp.where(valid, s_of_p[a_safe], -1)           # (K, N)
        rows = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None],
                                (K, N))
        cols = jnp.where(s_tgt >= 0, s_tgt, S)
        member_s = jnp.zeros((K, S), bool).at[rows, cols].max(s_tgt >= 0,
                                                              mode="drop")
        # min-scatter → FIRST observing feature per (keyframe, point),
        # matching the full version's argmax-of-first-hit under duplicates
        feat_s = jnp.full((K, S), N, jnp.int32).at[rows, cols].min(
            jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)),
            mode="drop")
        feat_s = jnp.where(feat_s >= N, -1, feat_s)

    n_obs = jnp.sum(member_s.astype(jnp.int32), axis=0)        # (S,)
    pos_s = state.mp_pos[slot_safe]                            # (S, 3)
    centers = state.keyframe_centers()                         # (K, 3)
    delta = pos_s[None, :, :] - centers[:, None, :]            # (K, S, 3)
    norm = jnp.linalg.norm(delta, axis=-1, keepdims=True)
    unit = delta / jnp.maximum(norm, 1e-12)
    mean_dir = jnp.sum(jnp.where(member_s[..., None], unit, 0.0), axis=0)
    mean_dir = mean_dir / jnp.maximum(
        jnp.linalg.norm(mean_dir, axis=-1, keepdims=True), 1e-12)

    # first max_obs_kf observing keyframes (ascending slot order) via top_k
    key = jnp.where(member_s, K - jnp.arange(K, dtype=jnp.int32)[:, None], 0)
    vals = jax.lax.top_k(key.T, max_obs_kf)[0]                 # (S, J)
    top_ok = vals > 0
    top_kf = jnp.where(top_ok, K - vals, 0)                    # (S, J)
    feat_idx = feat_s[top_kf, jnp.arange(S, dtype=jnp.int32)[:, None]]
    ok = top_ok & (feat_idx >= 0)
    feat_safe = jnp.where(ok, feat_idx, 0)

    descs = state.kf_desc[top_kf, feat_safe]                   # (S, J, 8)
    octaves = state.kf_kp_octave[top_kf, feat_safe]            # (S, J)

    x = descs[:, :, None, :] ^ descs[:, None, :, :]            # (S, J, J, 8)
    d = jnp.sum(popcount_u32(x), axis=-1)
    pair_ok = ok[:, :, None] & ok[:, None, :]
    summed = jnp.sum(jnp.where(pair_ok, d, 0), axis=-1)
    summed = jnp.where(ok, summed, jnp.iinfo(jnp.int32).max)
    rep = jnp.argmin(summed, axis=-1)                          # (S,)
    rep_desc = jnp.take_along_axis(descs, rep[:, None, None], axis=1)[:, 0]
    rep_kf = jnp.take_along_axis(top_kf, rep[:, None], axis=1)[:, 0]
    rep_oct = jnp.take_along_axis(octaves, rep[:, None], axis=1)[:, 0]

    rep_center = centers[rep_kf]                               # (S, 3)
    dist = jnp.linalg.norm(pos_s - rep_center, axis=-1)
    dmin, dmax = compute_dmin_dmax(dist, rep_oct, num_levels, scale_factor)

    upd = ok_s & state.mp_valid[slot_safe] & (n_obs > 0)       # (S,)
    w = jnp.where(upd, slots, P)                               # masked scatter
    return state._replace(
        mp_mean_dir=state.mp_mean_dir.at[w].set(mean_dir, mode="drop"),
        mp_desc=state.mp_desc.at[w].set(rep_desc, mode="drop"),
        mp_dmin=state.mp_dmin.at[w].set(dmin, mode="drop"),
        mp_dmax=state.mp_dmax.at[w].set(dmax, mode="drop"),
    )
