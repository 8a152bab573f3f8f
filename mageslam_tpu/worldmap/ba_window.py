"""Local/global BA problem assembly from MapState, and result write-back.

Replaces ThreadSafeMap::GetMapPointsAndDistantKeyframes (ThreadSafeMap.cpp:
868-960: adaptive covisibility threshold targeting 1500-2000 observations),
BuildGlobalBundleAdjustData (:353), AdjustPosesAndMapPoints (:973), and the
information scaling in BundleAdjust.cpp:140-147 (observation information =
MapPointRefinementConfidence(refinement count)).

Fixed shapes: the assembled problem has Kb camera slots, Pb point slots and
Ob observation slots (Budgets.MaxBaCameras/MaxBaPoints/MaxBaObs); masked
compaction (argsort on a priority key) selects which map entities occupy them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.problem import BAProblem, empty_problem
from ..geometry.se3 import Pose
from .covisibility import covisibility_matrix, membership_matrix
from .map_state import (MapState, refinement_confidence,
                        refresh_point_stats_slots)

_BIG = jnp.int32(1 << 30)


class BAWindow(NamedTuple):
    """A BAProblem plus the slot maps needed to write results back."""

    problem: BAProblem
    cam_slot: jax.Array    # (Kb,) int32 — global keyframe slot per BA camera, -1 pad
    pt_slot: jax.Array     # (Pb,) int32 — global point slot per BA point, -1 pad
    obs_kf: jax.Array      # (Ob,) int32 — global keyframe slot per observation
    obs_feat: jax.Array    # (Ob,) int32 — feature index per observation
    theta: jax.Array       # () int32 — covis threshold actually used


def _select_theta(count_at, theta0: jax.Array, upper: int, lower: int,
                  theta_min: int, step: int, max_steps: int) -> jax.Array:
    """Reproduce the reference's threshold walk (ThreadSafeMap.cpp:944-958):
    step θ up while too many connections, down while too few — evaluated here
    over a static ladder since count(θ) is monotone non-increasing in θ."""
    offsets = jnp.arange(-max_steps, max_steps + 1, dtype=jnp.int32) * step
    thetas = jnp.maximum(theta0 + offsets, theta_min)
    counts = jax.vmap(count_at)(thetas)
    c0 = count_at(theta0)

    # too many → smallest θ ≥ θ0 with count ≤ upper (else the largest ladder θ)
    up_ok = (thetas >= theta0) & (counts <= upper)
    up_choice = jnp.where(jnp.any(up_ok),
                          jnp.min(jnp.where(up_ok, thetas, _BIG)),
                          jnp.max(thetas))
    # too few → largest θ < θ0 with count ≥ lower (else θ_min)
    down_ok = (thetas < theta0) & (counts >= lower)
    down_choice = jnp.where(jnp.any(down_ok),
                            jnp.max(jnp.where(down_ok, thetas, -_BIG)),
                            jnp.int32(theta_min))
    return jnp.where(c0 > upper, up_choice,
                     jnp.where(c0 < lower, jnp.maximum(down_choice, theta_min), theta0))


def build_local_ba_window(
    state: MapState,
    ki: jax.Array,                # () int32 — the new keyframe slot
    max_cams: int,
    max_points: int,
    max_obs: int,
    theta0: int = 15,
    upper_connections: int = 2000,
    lower_connections: int = 1500,
    theta_min: int = 15,
    theta_step: int = 15,
    theta_max_steps: int = 1,
    global_window: bool = False,
    member: jax.Array | None = None,
) -> BAWindow:
    """Assemble the covisibility-bounded local BA problem around keyframe `ki`
    (or the whole map when `global_window`). Keyframes outside the covisible
    set (but observing its points) are included as fixed anchors, exactly like
    the reference (ThreadSafeMap.cpp:936-941 SetFixed). Pass a current
    `member` (K, P) to skip the internal membership rebuild (the mapping core
    threads one, worldmap/member_index.py)."""
    K, P, N = state.capacity
    if member is None:
        member = membership_matrix(state)                   # (K, P)
    covis = covisibility_matrix(state, member)

    def obs_count_at(theta):
        kc = (covis[ki] >= theta) | (jnp.arange(K) == ki)
        kc = kc & state.kf_valid
        mp = jnp.any(member & kc[:, None], axis=0)          # (P,)
        # association count = every observation of every selected point
        return jnp.sum(jnp.where(mp[None, :], member.astype(jnp.int32), 0))

    if global_window:
        theta = jnp.int32(0)
        kc_mask = state.kf_valid
    else:
        theta = _select_theta(obs_count_at, jnp.int32(theta0), upper_connections,
                              lower_connections, theta_min, theta_step, theta_max_steps)
        kc_mask = ((covis[ki] >= theta) | (jnp.arange(K) == ki)) & state.kf_valid

    mp_mask = jnp.any(member & kc_mask[:, None], axis=0) & state.mp_valid
    kf_mask = jnp.any(member & mp_mask[None, :], axis=1) & state.kf_valid
    kf_mask = kf_mask | kc_mask

    # --- compact keyframes into Kb slots: covisible window first, then anchors ---
    kf_priority = jnp.where(kf_mask,
                            jnp.where(kc_mask, 0, 1) * K + jnp.arange(K),
                            _BIG)
    kf_order = jnp.argsort(kf_priority)
    cam_slot = jnp.where(jnp.sort(kf_priority)[:max_cams] < _BIG,
                         kf_order[:max_cams], -1).astype(jnp.int32)
    cam_ok = cam_slot >= 0
    cam_safe = jnp.where(cam_ok, cam_slot, 0)
    # global→local camera index table (masked rows dropped, not clamped)
    cam_local = jnp.full((K,), -1, jnp.int32).at[
        jnp.where(cam_ok, cam_slot, K)
    ].set(jnp.arange(max_cams, dtype=jnp.int32), mode="drop")

    # --- compact points into Pb slots ---
    selected_cam = jnp.zeros((K,), bool).at[cam_safe].max(cam_ok)
    # a point is usable only if selected and observed by ≥1 selected camera
    mp_used = mp_mask & jnp.any(member & selected_cam[:, None], axis=0)
    pt_priority = jnp.where(mp_used, jnp.arange(P), _BIG)
    pt_order = jnp.argsort(pt_priority)
    pt_slot = jnp.where(jnp.sort(pt_priority)[:max_points] < _BIG,
                        pt_order[:max_points], -1).astype(jnp.int32)
    pt_ok = pt_slot >= 0
    pt_safe = jnp.where(pt_ok, pt_slot, 0)
    pt_local = jnp.full((P,), -1, jnp.int32).at[
        jnp.where(pt_ok, pt_slot, P)
    ].set(jnp.arange(max_points, dtype=jnp.int32), mode="drop")

    # --- observations: every (selected kf, feature) whose point is selected ---
    assoc = state.kf_assoc                                   # (K, N)
    a_safe = jnp.where(assoc >= 0, assoc, 0)
    obs_ok = (
        (assoc >= 0)
        & state.kf_kp_valid
        & selected_cam[:, None]
        & (pt_local[a_safe] >= 0)
        & (cam_local[:, None] >= 0)
    )                                                        # (K, N)
    flat_ok = obs_ok.reshape(-1)
    flat_priority = jnp.where(flat_ok, jnp.arange(K * N), _BIG)
    flat_order = jnp.argsort(flat_priority)[:max_obs]
    o_ok = jnp.sort(flat_priority)[:max_obs] < _BIG
    o_idx = jnp.where(o_ok, flat_order, 0)
    o_kf = (o_idx // N).astype(jnp.int32)
    o_feat = (o_idx % N).astype(jnp.int32)

    obs_cam = jnp.where(o_ok, cam_local[o_kf], 0)
    obs_pt = jnp.where(o_ok, pt_local[a_safe[o_kf, o_feat]], 0)
    obs_uv = state.kf_kp_xy[o_kf, o_feat]
    info = refinement_confidence(state.mp_refine_count[a_safe[o_kf, o_feat]])
    obs_info = jnp.where(o_ok, jnp.maximum(info, 1e-3), 0.0)

    # --- persisted keyframe tethers whose BOTH endpoints are in the window
    # (BundleAdjust.cpp:57-113: constraints added when the origin keyframe is
    # part of the problem; tether_cam1 = origin, tether_cam2 = owner) ---
    T = state.tether_weight.shape[0]
    to_safe = jnp.where(state.tether_origin >= 0, state.tether_origin, 0)
    tw_safe = jnp.where(state.tether_owner >= 0, state.tether_owner, 0)
    t_cam1 = cam_local[to_safe]
    t_cam2 = cam_local[tw_safe]
    t_ok = ((state.tether_weight > 0) & (state.tether_origin >= 0)
            & (state.tether_owner >= 0) & (t_cam1 >= 0) & (t_cam2 >= 0)
            & state.kf_valid[to_safe] & state.kf_valid[tw_safe])

    # --- fill the problem ---
    problem = empty_problem(max_cams, max_points, max_obs, n_tethers=T)
    in_window = jnp.zeros((K,), bool).at[cam_safe].max(cam_ok & kc_mask[cam_safe])
    fixed = state.kf_fixed[cam_safe] | jnp.logical_not(kc_mask[cam_safe])
    problem = problem._replace(
        poses=Pose(state.kf_pose.R[cam_safe], state.kf_pose.t[cam_safe]),
        intrinsics=state.kf_cam[cam_safe],
        cam_fixed=jnp.where(cam_ok, fixed, True),
        cam_valid=cam_ok,
        points=state.mp_pos[pt_safe],
        pt_valid=pt_ok,
        obs_cam=obs_cam,
        obs_pt=obs_pt,
        obs_uv=obs_uv,
        obs_info=obs_info,
        tether_kind=state.tether_kind,
        tether_cam1=jnp.where(t_ok, t_cam1, 0),
        tether_cam2=jnp.where(t_ok, t_cam2, 0),
        tether_pose=state.tether_pose,
        tether_distance=state.tether_distance,
        tether_weight=jnp.where(t_ok, state.tether_weight, 0.0),
    )
    del in_window
    return BAWindow(
        problem=problem,
        cam_slot=cam_slot,
        pt_slot=pt_slot,
        obs_kf=jnp.where(o_ok, o_kf, -1),
        obs_feat=jnp.where(o_ok, o_feat, -1),
        theta=theta,
    )


def apply_ba_results(
    state: MapState,
    window: BAWindow,
    poses: Pose,               # (Kb,) optimized poses
    points: jax.Array,         # (Pb, 3) optimized positions
    outlier_obs: jax.Array,    # (Ob,) bool — observations removed by the BA
    num_levels: int,
    scale_factor: float,
    fidx: jax.Array | None = None,
):
    """ThreadSafeMap::AdjustPosesAndMapPoints (ThreadSafeMap.cpp:973-1046):
    write optimized poses/points back, unassociate outlier observations,
    bump refinement counts, refresh the affected points' statistics, and
    remove points left with <2 observers.

    With `fidx` (threaded feature-index membership) the observer recount and
    the statistics refresh read the index instead of re-scattering from the
    association matrix, and the updated index is returned: (state, fidx)."""
    from .operations import remove_map_points

    K = state.kf_valid.shape[0]
    P = state.mp_valid.shape[0]
    cam_ok = (window.cam_slot >= 0) & jnp.logical_not(window.problem.cam_fixed)
    cam_w = jnp.where(cam_ok, window.cam_slot, K)      # masked → dropped scatter
    R = state.kf_pose.R.at[cam_w].set(poses.R, mode="drop")
    t = state.kf_pose.t.at[cam_w].set(poses.t, mode="drop")

    pt_ok = window.pt_slot >= 0
    pt_safe = jnp.where(pt_ok, window.pt_slot, 0)
    pt_w = jnp.where(pt_ok, window.pt_slot, P)
    mp_pos = state.mp_pos.at[pt_w].set(points, mode="drop")
    refine = state.mp_refine_count.at[pt_safe].add(pt_ok.astype(jnp.int32))

    state = state._replace(
        kf_pose=Pose(R, t), mp_pos=mp_pos, mp_refine_count=refine
    )

    # unassociate outliers (BundleAdjust outliers → Map::RemoveAssociation)
    out_ok = outlier_obs & (window.obs_kf >= 0)
    k_o = jnp.where(out_ok, window.obs_kf, K)
    f_o = jnp.where(out_ok, window.obs_feat, 0)
    assoc = state.kf_assoc.at[k_o, f_o].set(-1, mode="drop")
    state = state._replace(kf_assoc=assoc)

    K_cap, P_cap, N_cap = state.capacity
    S = window.pt_slot.shape[0]
    if fidx is not None:
        from .member_index import fidx_remove_obs, fidx_remove_points

        # mirror the outlier unassociations (each observation's global point
        # slot comes from the window's slot map; a keyframe observes a point
        # through at most one feature — member_index.py invariant)
        p_o = jnp.where(pt_ok, window.pt_slot, 0)[window.problem.obs_pt]
        fidx = fidx_remove_obs(fidx, window.obs_kf, p_o, out_ok)
        n_obs_p = jnp.sum((fidx >= 0).astype(jnp.int32), axis=0)   # (P,)
        dead = jnp.zeros_like(state.mp_valid).at[
            jnp.where(pt_ok & (n_obs_p[pt_safe] < 2), window.pt_slot, P_cap)
        ].max(True, mode="drop")
        dead = state.mp_valid & dead
        state = remove_map_points(state, dead)
        fidx = fidx_remove_points(fidx, dead)
        state = refresh_point_stats_slots(state, window.pt_slot, num_levels,
                                          scale_factor, fidx=fidx)
        return state, fidx

    # points with <2 observers after outlier removal are dead. Only window
    # points can have lost observations, so count observers for the (S,)
    # window slots instead of building the full (K, P) membership (measured
    # 12.4 ms → ~3 ms for the whole write-back on the real chip).
    s_of_p = jnp.full((P_cap,), -1, jnp.int32).at[
        jnp.where(pt_ok, window.pt_slot, P_cap)
    ].set(jnp.arange(window.pt_slot.shape[0], dtype=jnp.int32), mode="drop")
    valid_a = (assoc >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    s_tgt = jnp.where(valid_a, s_of_p[jnp.where(valid_a, assoc, 0)], -1)
    n_obs_s = jnp.zeros((S,), jnp.int32).at[
        jnp.where(s_tgt >= 0, s_tgt, S)
    ].add((s_tgt >= 0).astype(jnp.int32), mode="drop")
    dead = jnp.zeros_like(state.mp_valid).at[
        jnp.where(pt_ok & (n_obs_s < 2), window.pt_slot, P_cap)
    ].max(True, mode="drop")
    state = remove_map_points(state, state.mp_valid & dead)
    # full medoid/statistics refresh over every window point. A round-4
    # experiment split this into geometry-only for moved points + full
    # medoid only for association changes (the reference's SetPosition vs
    # AddAssociation distinction, MapPoint.cpp:44-77,170-177) and saved
    # ~5 ms per mapping event on chip — but stale representative
    # descriptors starved guided matching on long trajectories (360° orbit:
    # tracked 216/336 with the split vs 328/336 without; the split's dMin/
    # dMax freeze on any point whose stored observer slot was culled).
    # Overlapping BA windows re-running the full medoid are what keep
    # representatives fresh map-wide.
    return refresh_point_stats_slots(state, window.pt_slot, num_levels,
                                     scale_factor)
