"""Map mutations: keyframe insertion, map point creation/merge/removal, culling.

These replace the pointer-graph surgery in Map/Map.cpp + ThreadSafeMap.cpp with
masked scatter/gather over the banks. Every function is pure
(MapState → MapState) and jit-safe; the runtime's phase ordering (SURVEY §3.3)
defines the legal call sequence, exactly as the reference's state machine did.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose
from .map_state import INVALID, MapState, point_keyframe_matrix, point_octave_histogram


def insert_keyframe(
    state: MapState,
    pose: Pose,                 # single pose
    cam: jax.Array,             # (4,) fx fy cx cy
    frame_id: jax.Array,        # () int32
    kp_xy: jax.Array,           # (N, 2) undistorted
    kp_octave: jax.Array,       # (N,) int32
    desc: jax.Array,            # (N, 8) uint32
    kp_valid: jax.Array,        # (N,) bool
    assoc: jax.Array,           # (N,) int32 → point slot or -1 (current associations)
    fixed: jax.Array | bool = False,
    immortal: jax.Array | bool = False,
) -> tuple[MapState, jax.Array]:
    """ThreadSafeMap::InsertKeyframe (ThreadSafeMap.cpp:202-…). Returns
    (state, slot). If the bank is full, the write is dropped (slot = -1) —
    callers should cull before this can happen."""
    free = jnp.logical_not(state.kf_valid)
    slot = jnp.argmax(free).astype(jnp.int32)     # first free slot
    ok = jnp.any(free)
    s = jnp.where(ok, slot, 0)

    # only associate to currently-valid points
    assoc_ok = (assoc >= 0) & state.mp_valid[jnp.where(assoc >= 0, assoc, 0)]
    assoc_clean = jnp.where(assoc_ok, assoc, INVALID)

    def wr(bank, value):
        return bank.at[s].set(jnp.where(ok, value, bank[s]))

    new = state._replace(
        kf_valid=state.kf_valid.at[s].set(jnp.where(ok, True, state.kf_valid[s])),
        kf_fixed=wr(state.kf_fixed, jnp.asarray(fixed, bool)),
        kf_immortal=wr(state.kf_immortal, jnp.asarray(immortal, bool)),
        kf_pose=Pose(wr(state.kf_pose.R, pose.R), wr(state.kf_pose.t, pose.t)),
        kf_cam=wr(state.kf_cam, cam),
        kf_frame_id=wr(state.kf_frame_id, jnp.asarray(frame_id, jnp.int32)),
        kf_order=wr(state.kf_order, state.next_order),
        kf_kp_xy=wr(state.kf_kp_xy, kp_xy),
        kf_kp_octave=wr(state.kf_kp_octave, kp_octave),
        kf_desc=wr(state.kf_desc, desc),
        kf_kp_valid=wr(state.kf_kp_valid, kp_valid),
        kf_assoc=wr(state.kf_assoc, assoc_clean),
        next_order=state.next_order + jnp.where(ok, 1, 0),
    )
    return new, jnp.where(ok, slot, INVALID)


def create_map_points(
    state: MapState,
    pos: jax.Array,        # (M, 3) world positions
    desc: jax.Array,       # (M, 8) uint32 descriptor (initial representative)
    kf_a: jax.Array,       # (M,) int32 keyframe slot of first observation
    feat_a: jax.Array,     # (M,) int32 feature index in kf_a
    kf_b: jax.Array,       # (M,) int32 second observation keyframe
    feat_b: jax.Array,     # (M,) int32
    want: jax.Array,       # (M,) bool — which rows are real requests
) -> tuple[MapState, jax.Array]:
    """Map::CreateMapPoints — allocate point slots, write positions, associate
    into both observing keyframes. Returns (state, (M,) slot indices or -1)."""
    M = pos.shape[0]
    P = state.mp_valid.shape[0]
    free = jnp.logical_not(state.mp_valid)
    n_free = jnp.sum(free.astype(jnp.int32))
    # rank requests and map to the rank-th free slot
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1                     # (M,)
    ok = want & (rank < n_free)
    free_order = jnp.argsort(jnp.logical_not(free), stable=True)      # free slots first
    slots = free_order[jnp.clip(rank, 0, P - 1)].astype(jnp.int32)
    # masked requests scatter out-of-bounds: JAX drops them (mode="drop"),
    # which is the only safe way — clamping to slot 0 clobbers real writes
    slots_w = jnp.where(ok, slots, P)
    slots_safe = jnp.where(ok, slots, 0)

    new = state._replace(
        mp_valid=state.mp_valid.at[slots_w].set(True, mode="drop"),
        mp_pos=state.mp_pos.at[slots_w].set(pos, mode="drop"),
        mp_desc=state.mp_desc.at[slots_w].set(desc, mode="drop"),
        mp_refine_count=state.mp_refine_count.at[slots_w].set(0, mode="drop"),
        mp_created_order=state.mp_created_order.at[slots_w].set(
            state.next_order - 1, mode="drop"
        ),
        mp_found=state.mp_found.at[slots_w].set(1, mode="drop"),
        mp_predicted=state.mp_predicted.at[slots_w].set(1, mode="drop"),
    )

    # associate into both keyframes (scatter into the association matrix)
    K, N = state.kf_assoc.shape
    ka = jnp.where(ok, kf_a, K)
    kb = jnp.where(ok, kf_b, K)
    assoc = new.kf_assoc
    assoc = assoc.at[ka, feat_a].set(slots_safe, mode="drop")
    assoc = assoc.at[kb, feat_b].set(slots_safe, mode="drop")
    return new._replace(kf_assoc=assoc), jnp.where(ok, slots_safe, INVALID)


def remove_map_points(state: MapState, remove: jax.Array) -> MapState:
    """Invalidate points flagged in `remove` (P,) bool and clear every
    association referencing them (Map::RemoveAllAssociations + RemoveMapPoint)."""
    assoc = state.kf_assoc
    hit = (assoc >= 0) & remove[jnp.where(assoc >= 0, assoc, 0)]
    return state._replace(
        mp_valid=state.mp_valid & jnp.logical_not(remove),
        kf_assoc=jnp.where(hit, INVALID, assoc),
    )


def merge_map_points(state: MapState, src: jax.Array, dst: jax.Array,
                     want: jax.Array) -> MapState:
    """Map::MergeMapPoints: retarget every association of src→dst, then remove
    src. If a keyframe already observes dst, the src association is dropped
    (a keyframe observes a point at most once). src/dst/want are (M,) batches."""
    P = state.mp_valid.shape[0]
    # build a P-sized redirect table (masked rows scatter out-of-bounds → dropped)
    redirect = jnp.arange(P, dtype=jnp.int32)
    srcs = jnp.where(want, src, P)
    redirect = redirect.at[srcs].set(dst, mode="drop")

    assoc = state.kf_assoc
    safe = jnp.where(assoc >= 0, assoc, 0)
    new_assoc = jnp.where(assoc >= 0, redirect[safe], assoc)

    # drop duplicates: a keyframe observes a point at most once. On conflict
    # prefer keeping the pre-existing (unchanged) association and dropping the
    # merged-in one; among equals, keep the lowest feature index.
    K, N = assoc.shape
    changed = new_assoc != assoc
    eq = (new_assoc[:, :, None] == new_assoc[:, None, :]) & (new_assoc[:, None, :] >= 0)
    tri = jnp.tril(jnp.ones((N, N), bool), k=-1)     # [i, j]: j < i
    # entry i is dropped if an equal entry j is preferred: unchanged beats
    # changed; ties broken by position
    preferred = (changed[:, :, None] & jnp.logical_not(changed[:, None, :])) | (
        (changed[:, :, None] == changed[:, None, :]) & tri[None]
    )
    dup = jnp.any(eq & preferred, axis=-1)           # (K, N)
    new_assoc = jnp.where(dup, INVALID, new_assoc)

    mp_valid = state.mp_valid & ~jnp.zeros_like(state.mp_valid).at[srcs].max(
        want, mode="drop"
    )
    return state._replace(kf_assoc=new_assoc, mp_valid=mp_valid)


def add_keyframe_tether(
    state: MapState,
    owner: jax.Array,          # () int32 keyframe slot owning the tether
    origin: jax.Array,         # () int32 the other keyframe
    kind: jax.Array,           # () int32 ba.problem.TETHER_*
    pose: Pose,                # measured origin→owner view-delta T_owner∘T_origin⁻¹
    distance: jax.Array | float = 1.0,
    weight: jax.Array | float = 1.0,
) -> MapState:
    """Persist a spatial constraint between two keyframes (Data/Tether.h:12-68).
    The tether is re-assembled into every BA window containing both keyframes
    (build_local_ba_window ↔ BundleAdjust.cpp:57-113). Dropped silently if
    the bank is full (the reference has no cap; 16 slots cover every source:
    stereo rigs + external anchors)."""
    free = state.tether_weight <= 0
    slot = jnp.argmax(free).astype(jnp.int32)
    ok = jnp.any(free)
    s = jnp.where(ok, slot, 0)

    def wr(bank, value):
        return bank.at[s].set(jnp.where(ok, value, bank[s]))

    return state._replace(
        tether_owner=wr(state.tether_owner, jnp.asarray(owner, jnp.int32)),
        tether_origin=wr(state.tether_origin, jnp.asarray(origin, jnp.int32)),
        tether_kind=wr(state.tether_kind, jnp.asarray(kind, jnp.int32)),
        tether_pose=Pose(wr(state.tether_pose.R, pose.R),
                         wr(state.tether_pose.t, pose.t)),
        tether_distance=wr(state.tether_distance,
                           jnp.asarray(distance, jnp.float32)),
        tether_weight=wr(state.tether_weight, jnp.asarray(weight, jnp.float32)),
    )


def remove_keyframes(state: MapState, remove: jax.Array,
                     fidx: jax.Array | None = None):
    """Invalidate keyframes flagged in `remove` (K,) bool; their association
    rows are cleared. Points left with <2 observers are removed
    (ThreadSafeMap::CullLocalKeyframes tail, ThreadSafeMap.cpp:1139-1150).
    Tethers referencing a removed keyframe die with it.

    With `fidx` (the threaded (K, P) feature-index membership,
    worldmap/member_index.py) the observer recount is an elementwise reduce
    instead of a fresh 131k-update scatter, and the updated fidx is returned
    alongside: (state, fidx)."""
    t_dead = (remove[jnp.where(state.tether_owner >= 0, state.tether_owner, 0)]
              | remove[jnp.where(state.tether_origin >= 0,
                                 state.tether_origin, 0)])
    state = state._replace(
        kf_valid=state.kf_valid & jnp.logical_not(remove),
        kf_assoc=jnp.where(remove[:, None], INVALID, state.kf_assoc),
        tether_weight=jnp.where(t_dead, 0.0, state.tether_weight),
    )
    if fidx is None:
        member = point_keyframe_matrix(state)
        n_obs = jnp.sum(member.astype(jnp.int32), axis=0)
        orphan = state.mp_valid & (n_obs < 2)
        return remove_map_points(state, orphan)
    from .member_index import fidx_remove_keyframes, fidx_remove_points
    fidx = fidx_remove_keyframes(fidx, remove)
    n_obs = jnp.sum((fidx >= 0).astype(jnp.int32), axis=0)
    orphan = state.mp_valid & (n_obs < 2)
    return (remove_map_points(state, orphan),
            fidx_remove_points(fidx, orphan))


def cull_recent_map_points(
    state: MapState,
    ki: jax.Array,                 # () int32 current keyframe slot
    failed: jax.Array,             # (P,) bool — failed the 25% found/predicted test
    min_keyframes_for_culling: int = 3,
    recent_window: int = 3,
    fidx: jax.Array | None = None,
):
    """ThreadSafeMap::CullRecentMapPoints (ThreadSafeMap.cpp:490-…): recently
    created points must quickly earn ≥3 observing keyframes and pass the
    tracking found/predicted ratio, else they are removed. The reference keeps
    a 3-slot proxy history; here 'recent' is an insertion-epoch window and the
    'seen in current keyframe → defer' exception is preserved via the
    association row of ki.

    Epoch alignment (ThreadSafeMap.cpp:519-527): a point created at insertion
    n sits in history slot 0 during insertion n+1, and the under-observed
    (<MinNumKeyframesForMapPointCulling keyframes) test only runs for
    idxPointSet > 0 — i.e. at insertions n+2 and n+3 (age ≥ 2). Applying it
    at age 1 is off by one insertion and wrongly culls every point that
    wasn't re-tracked into the very next keyframe (measured: 92 of 226 init
    points killed at the 2nd keyframe, collapsing orbit tracking). The
    failed-25% test applies at every history age (slots 0-2, age 1-3)."""
    member = point_keyframe_matrix(state) if fidx is None else (fidx >= 0)
    n_obs = jnp.sum(member.astype(jnp.int32), axis=0)
    age = (state.next_order - 1) - state.mp_created_order        # epochs since creation
    recent = state.mp_valid & (age >= 0) & (age <= recent_window)
    under_observed = recent & (age >= 2) & (n_obs < min_keyframes_for_culling)
    to_cull = (under_observed | (recent & failed))
    seen_in_ki = member[ki]
    to_cull = to_cull & jnp.logical_not(seen_in_ki)
    if fidx is None:
        return remove_map_points(state, to_cull)
    from .member_index import fidx_remove_points
    return (remove_map_points(state, to_cull),
            fidx_remove_points(fidx, to_cull))


def cull_local_keyframes(
    state: MapState,
    ki: jax.Array,                  # () int32 current keyframe slot
    covis: jax.Array,               # (K, K) int32 covisibility counts
    num_levels: int,
    covis_theta: int = 15,
    max_tracking_point_overlap: float = 0.9,
    min_keyframe_covis_count: int = 3,
    max_culls: int = 8,
    fidx: jax.Array | None = None,
):
    """ThreadSafeMap::CullLocalKeyframes: a covisible keyframe is redundant when
    ≥90% of its map points are observed at equal-or-finer scale by ≥3 other
    keyframes. The reference walks the covisible set newest-first, culling
    each redundant keyframe and re-evaluating against the UPDATED map
    (ThreadSafeMap.cpp:1077-1150 — octave counts shrink as keyframes go, so
    redundancy only decreases and the sweep terminates). Here the same loop
    is a lax.while_loop: cull the newest redundant candidate, recompute, and
    repeat until none remain (or the max_culls safety bound). Returns
    (state, culled mask (K,)) — or (state, culled, fidx) when the threaded
    feature-index membership is passed (the octave histogram then comes from
    gathers + masked sums instead of a per-iteration 131k-update scatter)."""
    K, P, N = state.capacity
    connected = covis[ki] >= covis_theta

    def find_victim(st: MapState, fx) -> tuple[jax.Array, jax.Array]:
        # ALWAYS the scatter-based histogram, even with fidx threaded: the
        # gather form (member_index.octave_histogram_of) reads K*P=2M
        # dynamically-indexed elements where the scatter updates only
        # K*N=131k — measured 23.5 ms vs 3.3 ms for this whole stage on the
        # chip (tools/prof_mapping.py r5). fidx stays threaded for the
        # remove_keyframes bookkeeping below; st.kf_assoc is equally current
        # (removals clear rows), so the two forms agree bit-exactly
        # (tests/test_worldmap.py TestFidxParity).
        hist = point_octave_histogram(st, num_levels)            # (P, L)
        cum = jnp.cumsum(hist, axis=1)                           # obs at level ≤ l
        candidate = (
            connected
            & st.kf_valid
            & jnp.logical_not(st.kf_immortal)
            & (jnp.arange(K) != ki)
        )
        # per keyframe: fraction of its points seen equal-or-finer elsewhere
        assoc = st.kf_assoc
        a_ok = (assoc >= 0) & st.kf_kp_valid
        safe = jnp.where(a_ok, assoc, 0)
        octv = jnp.clip(st.kf_kp_octave, 0, num_levels - 1)
        seen_fine = jnp.take_along_axis(cum[safe], octv[..., None], axis=-1)[..., 0]
        well_observed = a_ok & ((seen_fine - 1) >= min_keyframe_covis_count)
        n_points = jnp.sum(a_ok.astype(jnp.int32), axis=1)
        n_well = jnp.sum(well_observed.astype(jnp.int32), axis=1)
        redundant = candidate & (
            n_well.astype(jnp.float32)
            >= max_tracking_point_overlap * n_points.astype(jnp.float32)
        ) & (n_points > 0)
        # newest-first (anti-cascade, ThreadSafeMap.cpp:1077-1080)
        order_score = jnp.where(redundant, st.kf_order, -1)
        victim = jnp.argmax(order_score).astype(jnp.int32)
        return victim, jnp.any(redundant)

    # do-while form: each iteration culls the carried victim and evaluates
    # find_victim ONCE for the next round (cond reads the carry). The naive
    # while_loop evaluated find_victim in BOTH cond and body — ~2 ms of
    # (K, N) histogram/gather work per eval on chip, doubled per cull.
    victim0, any0 = find_victim(state, fidx)

    def cond(carry):
        st, fx, culled, n, victim, any_v = carry
        return any_v & (n < max_culls)

    def body(carry):
        st, fx, culled, n, victim, any_v = carry
        cull_mask = (jnp.arange(K) == victim) & any_v
        if fidx is None:
            st = remove_keyframes(st, cull_mask)
        else:
            st, fx = remove_keyframes(st, cull_mask, fidx=fx)
        v, a = find_victim(st, fx)
        return st, fx, culled | cull_mask, n + 1, v, a

    carry0 = (state, fidx if fidx is not None else jnp.zeros((0,), jnp.int32),
              jnp.zeros((K,), bool), jnp.int32(0), victim0, any0)
    if fidx is None:
        # keep the dummy out of the trace entirely
        def body_nf(carry):
            st, culled, n, victim, any_v = carry
            cull_mask = (jnp.arange(K) == victim) & any_v
            st = remove_keyframes(st, cull_mask)
            v, a = find_victim(st, None)
            return st, culled | cull_mask, n + 1, v, a

        state, culled, _, _, _ = jax.lax.while_loop(
            lambda c: c[4] & (c[2] < max_culls), body_nf,
            (state, jnp.zeros((K,), bool), jnp.int32(0), victim0, any0))
        return state, culled

    state, fidx, culled, _, _, _ = jax.lax.while_loop(cond, body, carry0)
    return state, culled, fidx
