"""New map point creation for a freshly inserted keyframe.

Replaces Mapping/NewMapPointsCreation.{h,cpp}: for the new keyframe Ki and its
nearest covisible keyframes Kc, match unassociated features, validate geometry
(epipolar, cheirality, distance-ratio, scale, parallax —
NewMapPointsCreation.cpp:74-160), cap new points per image grid cell, create
the points, then re-associate them into the remaining covisible keyframes
(LocallyAssociateNewAssociations, :332-425).

TPU shape: each Ki×Kc pair is one dense two-way match + one batched gate pass
over all N features; the per-match sequential loop becomes a first-valid-Kc
selection plus an order-preserving per-cell rank for the grid cap.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry.se3 import Pose
from ..geometry.triangulation import triangulate_midpoint
from ..ops.matching import match_two_way, radius_match, dedup_by_target
from .map_state import MapState, compute_dmin_dmax, predict_octave
from .operations import create_map_points


# trace-time debug switch: when set, each create_new_map_points call prints
# per-gate survivor counts via jax.debug.print (zero cost when unset)
_DEBUG = bool(os.environ.get("MAGESLAM_DEBUG_NEWPOINTS"))


class NewPointsResult(NamedTuple):
    state: MapState
    created: jax.Array        # () int32 — number of points created
    slots: jax.Array          # (N,) int32 — point slot per Ki feature or -1
    fidx: jax.Array | None = None  # updated feature-index membership (when threaded)


def _epipolar_distance(F: jax.Array, p_from: jax.Array, p_to: jax.Array) -> jax.Array:
    """Distance of p_to from the epipolar line F·p_from (Utils/Epipolar
    DistanceFromEpipolarLine), batched over (..., 2) points."""
    one = jnp.ones_like(p_from[..., :1])
    h_from = jnp.concatenate([p_from, one], axis=-1)
    line = jnp.einsum("ij,...j->...i", F, h_from)
    h_to = jnp.concatenate([p_to, one], axis=-1)
    num = jnp.abs(jnp.sum(line * h_to, axis=-1))
    return num / jnp.sqrt(line[..., 0] ** 2 + line[..., 1] ** 2 + 1e-20)


def _fundamental(pose_a: Pose, cam_a: jax.Array, pose_b: Pose, cam_b: jax.Array) -> jax.Array:
    """F mapping pixels of camera a to epipolar lines in camera b
    (ComputeFundamentalMatrix for undistorted-pinhole calibrations)."""
    # relative transform a→b: T = Tb ∘ Ta⁻¹
    rel = pose_b.compose(pose_a.inverse())
    tx = jnp.array(
        [
            [0.0, -rel.t[2], rel.t[1]],
            [rel.t[2], 0.0, -rel.t[0]],
            [-rel.t[1], rel.t[0], 0.0],
        ]
    )
    E = tx @ rel.R
    def kinv(cam):
        return jnp.array(
            [
                [1.0 / cam[0], 0.0, -cam[2] / cam[0]],
                [0.0, 1.0 / cam[1], -cam[3] / cam[1]],
                [0.0, 0.0, 1.0],
            ]
        )
    return kinv(cam_b).T @ E @ kinv(cam_a)


def create_new_map_points(
    state: MapState,
    ki: jax.Array,                    # () int32 new keyframe slot
    covis: jax.Array,                 # (K, K) int32 covisibility counts
    map_scale: jax.Array,             # () f32
    num_levels: int,
    pyramid_scale: float,
    image_width: float,
    image_height: float,
    image_border: float = 7.5,
    max_frames: int = 5,              # MaxFramesForNewPointsCreation
    covis_theta: int = 15,
    max_epipolar_error: float = 4.0,  # NewMapPointsCreationSettings.MaxEpipolarError
    min_distance_ratio: float = 2.0,
    min_parallax_degrees: float = 0.0238961594253207,
    min_kf_distance_sq: float = 0.0,
    grid_w: int = 4,
    grid_h: int = 3,
    max_grid_count: int = 6,
    max_hamming: int = 45,
    min_hamming_diff: int = 8,
    search_radius: float = 11.8816156,   # NewMapPointsSearchRadius
    max_keyframe_angle_degrees: float = 60.0,
    max_new_points: int = 256,
    fidx: jax.Array | None = None,
) -> NewPointsResult:
    K, P, N = state.capacity

    ki_pose = Pose(state.kf_pose.R[ki], state.kf_pose.t[ki])
    ki_cam = state.kf_cam[ki]
    ki_center = ki_pose.center()
    ki_xy = state.kf_kp_xy[ki]
    ki_oct = state.kf_kp_octave[ki]
    ki_desc = state.kf_desc[ki]
    ki_unassoc = state.kf_kp_valid[ki] & (state.kf_assoc[ki] < 0)

    # nearest covisible keyframes (sorted by center distance, NewMapPoints
    # Creation.cpp:216-222), excluding Ki itself and too-close frames
    centers = state.keyframe_centers()
    d2 = jnp.sum((centers - ki_center[None]) ** 2, axis=-1)
    connected = (covis[ki] >= covis_theta) & state.kf_valid & (jnp.arange(K) != ki)
    far_enough = d2 >= min_kf_distance_sq * map_scale * map_scale
    cand_kf = connected & far_enough
    order = jnp.argsort(jnp.where(cand_kf, d2, jnp.inf))
    kc_slots = order[:max_frames].astype(jnp.int32)            # (F,)
    kc_ok = cand_kf[kc_slots]

    cos_min_parallax = jnp.cos(jnp.deg2rad(jnp.float32(min_parallax_degrees)))

    def per_kc(kc, ok):
        kc_pose = Pose(state.kf_pose.R[kc], state.kf_pose.t[kc])
        kc_cam = state.kf_cam[kc]
        kc_center = kc_pose.center()
        kc_xy = state.kf_kp_xy[kc]
        kc_unassoc = state.kf_kp_valid[kc] & (state.kf_assoc[kc] < 0)

        m_idx, _ = match_two_way(
            ki_desc, ki_unassoc & ok, state.kf_desc[kc], kc_unassoc,
            max_hamming, min_hamming_diff,
        )
        has = m_idx >= 0
        m_safe = jnp.where(has, m_idx, 0)

        # epipolar gate (symmetric, :83-89)
        F_ki_kc = _fundamental(ki_pose, ki_cam, kc_pose, kc_cam)
        F_kc_ki = _fundamental(kc_pose, kc_cam, ki_pose, ki_cam)
        e1 = _epipolar_distance(F_ki_kc, ki_xy, kc_xy[m_safe])
        e2 = _epipolar_distance(F_kc_ki, kc_xy[m_safe], ki_xy)
        epi_ok = (e1 + e2) <= 2.0 * max_epipolar_error

        # triangulate (midpoint — TriangulatePointWorldSpace)
        X = triangulate_midpoint(ki_cam, ki_pose, ki_xy, kc_cam, kc_pose, kc_xy[m_safe])

        # cheirality in both frames (:95-101)
        z_ki = ki_pose.transform(X)[:, 2]
        z_kc = kc_pose.transform(X)[:, 2]
        front_ok = (z_ki > 0) & (z_kc > 0)

        # distance-ratio (:117-126)
        d_ki = jnp.linalg.norm(X - ki_center[None], axis=-1)
        d_kc = jnp.linalg.norm(X - kc_center[None], axis=-1)
        baseline = jnp.linalg.norm(ki_center - kc_center) + 1e-12
        ratio_ok = (d_ki / baseline) >= min_distance_ratio

        # scale test (:128-133): predicted octave in Kc within ±1 of its keypoint
        dmin_ki, _ = compute_dmin_dmax(d_ki, ki_oct, num_levels, pyramid_scale)
        pred_oct = predict_octave(d_kc, dmin_ki, pyramid_scale)
        scale_ok = jnp.abs(pred_oct - state.kf_kp_octave[kc][m_safe]) < 1

        # parallax (:53-64, :139-143)
        v1 = (X - kc_center[None]) / jnp.maximum(d_kc, 1e-12)[:, None]
        v2 = (X - ki_center[None]) / jnp.maximum(d_ki, 1e-12)[:, None]
        par_ok = jnp.sum(v1 * v2, axis=-1) <= cos_min_parallax

        good = has & epi_ok & front_ok & ratio_ok & scale_ok & par_ok & ok
        if _DEBUG:
            def cnt(m):
                return jnp.sum((m & has & ok).astype(jnp.int32))
            dbg = jnp.stack([jnp.sum((has & ok).astype(jnp.int32)), cnt(epi_ok),
                             cnt(front_ok), cnt(ratio_ok), cnt(scale_ok),
                             cnt(par_ok), jnp.sum(good.astype(jnp.int32))])
            return good, m_safe, X, v1, v2, d_ki, dbg
        return good, m_safe, X, v1, v2, d_ki

    if _DEBUG:
        good_f, feat_kc_f, X_f, v1_f, v2_f, dki_f, dbg_f = jax.vmap(per_kc)(
            kc_slots, kc_ok)
        jax.debug.print(
            "NPDBG ki={ki} unassoc={u} kc={kc} ok={ok}\n"
            "NPDBG gates (per kc: match epi front ratio scale par good):\n{d}",
            ki=ki, u=jnp.sum(ki_unassoc.astype(jnp.int32)),
            kc=kc_slots, ok=kc_ok, d=dbg_f)
    else:
        good_f, feat_kc_f, X_f, v1_f, v2_f, dki_f = jax.vmap(per_kc)(kc_slots, kc_ok)
    # (F, N) each; X_f (F, N, 3)

    # first-valid-Kc wins per Ki feature (nearest-first processing order)
    first = jnp.argmax(good_f, axis=0)                          # (N,)
    any_good = jnp.any(good_f, axis=0)
    feat_kc = jnp.take_along_axis(feat_kc_f, first[None, :], axis=0)[0]
    kc_of = kc_slots[first]
    X = jnp.take_along_axis(X_f, first[None, :, None], axis=0)[0]
    v1 = jnp.take_along_axis(v1_f, first[None, :, None], axis=0)[0]
    v2 = jnp.take_along_axis(v2_f, first[None, :, None], axis=0)[0]
    d_ki = jnp.take_along_axis(dki_f, first[None, :], axis=0)[0]

    # grid cap (CreateInitialAssociations grid, NewPointMaxGridCount): existing
    # associated keypoints prefill the cells; candidates take cells in
    # (kc-rank, feature) order until full
    gx = jnp.clip((ki_xy[:, 0] * grid_w / image_width).astype(jnp.int32), 0, grid_w - 1)
    gy = jnp.clip((ki_xy[:, 1] * grid_h / image_height).astype(jnp.int32), 0, grid_h - 1)
    cell = gx + gy * grid_w
    assoc_mask = state.kf_kp_valid[ki] & (state.kf_assoc[ki] >= 0)
    existing = jnp.zeros((grid_w * grid_h,), jnp.int32).at[
        jnp.where(assoc_mask, cell, grid_w * grid_h)
    ].add(1, mode="drop")

    cand_order = first * N + jnp.arange(N)                      # (kc_rank, feat) order
    same_cell = (cell[:, None] == cell[None, :]) & any_good[None, :] & any_good[:, None]
    earlier = cand_order[None, :] < cand_order[:, None]
    rank_in_cell = jnp.sum((same_cell & earlier).astype(jnp.int32), axis=1)
    cap_ok = (existing[cell] + rank_in_cell) < max_grid_count
    accept = any_good & cap_ok

    # cap total new points per call (fixed allocation batch)
    order_key = jnp.where(accept, cand_order, jnp.int32(1 << 30))
    rank_total = jnp.argsort(jnp.argsort(order_key))
    accept = accept & (rank_total < max_new_points)
    if _DEBUG:
        xbin = jnp.clip((ki_xy[:, 0] * 8 / image_width).astype(jnp.int32), 0, 7)
        hist = jnp.zeros((8,), jnp.int32).at[
            jnp.where(accept, xbin, 8)].add(1, mode="drop")
        jax.debug.print(
            "NPDBG any_good={g} cap_ok={c} accept={a} existing_cells={e} xhist={h}",
            g=jnp.sum(any_good.astype(jnp.int32)),
            c=jnp.sum((any_good & cap_ok).astype(jnp.int32)),
            a=jnp.sum(accept.astype(jnp.int32)), e=existing, h=hist)

    # viewing stats at creation (Ki is representative, :160-168)
    mean_dir = v1 + v2
    mean_dir = mean_dir / jnp.maximum(jnp.linalg.norm(mean_dir, axis=-1, keepdims=True), 1e-12)
    dmin, dmax = compute_dmin_dmax(d_ki, ki_oct, num_levels, pyramid_scale)

    new_state, slots = create_map_points(
        state, X, ki_desc,
        jnp.full((N,), ki, jnp.int32), jnp.arange(N, dtype=jnp.int32),
        kc_of, feat_kc, accept,
    )
    slot_safe = jnp.where(accept & (slots >= 0), slots, P)
    new_state = new_state._replace(
        mp_mean_dir=new_state.mp_mean_dir.at[slot_safe].set(mean_dir, mode="drop"),
        mp_dmin=new_state.mp_dmin.at[slot_safe].set(dmin, mode="drop"),
        mp_dmax=new_state.mp_dmax.at[slot_safe].set(dmax, mode="drop"),
    )

    # ---- LocallyAssociateNewAssociations: match new points into the other
    # covisible keyframes (radius match at the projected position) ----
    created_mask = accept & (slots >= 0)
    map_border = image_border - search_radius / 2.0
    cos_max_angle = jnp.cos(jnp.deg2rad(jnp.float32(max_keyframe_angle_degrees)))

    def associate_into(kc, ok):
        """New row of kf_assoc[kc] after matching the created points in.
        Each covisible keyframe touches only its OWN association row, so the
        F keyframes are independent — vmapped instead of a serialized loop
        (5 sequential radius matches measurably serialized the mapping
        core's tail on the real chip)."""
        kc_pose = Pose(new_state.kf_pose.R[kc], new_state.kf_pose.t[kc])
        kc_cam = new_state.kf_cam[kc]
        kc_center = kc_pose.center()
        Xc = kc_pose.transform(X)
        z = Xc[:, 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = kc_cam[0] * Xc[:, 0] * inv_z + kc_cam[2]
        v = kc_cam[1] * Xc[:, 1] * inv_z + kc_cam[3]
        in_border = (
            (u >= map_border) & (u < image_width - map_border)
            & (v >= map_border) & (v < image_height - map_border)
        )
        fwd = kc_pose.forward()
        angle_ok = jnp.einsum("ni,i->n", mean_dir, fwd) >= cos_max_angle
        dist = jnp.linalg.norm(X - kc_center[None], axis=-1)
        range_ok = (dist >= dmin) & (dist <= dmax)
        pred = predict_octave(dist, dmin, pyramid_scale)
        oct_ok = (pred >= 0) & (pred <= num_levels)
        not_originating = kc_of != kc
        cand = created_mask & (z > 0) & in_border & angle_ok & range_ok & oct_ok & not_originating

        unassoc = new_state.kf_kp_valid[kc] & (new_state.kf_assoc[kc] < 0)
        m_idx, m_dist = radius_match(
            ki_desc, jnp.stack([u, v], axis=-1), jnp.clip(pred, 0, num_levels - 1), cand,
            new_state.kf_desc[kc], new_state.kf_kp_xy[kc],
            new_state.kf_kp_octave[kc], unassoc,
            jnp.float32(search_radius), jnp.int32(max_hamming), jnp.int32(min_hamming_diff),
        )
        m_idx = dedup_by_target(m_idx, m_dist)
        hit = (m_idx >= 0) & ok
        tgt = jnp.where(hit, m_idx, N)
        row = new_state.kf_assoc[kc].at[tgt].set(
            jnp.where(hit, slots, -1), mode="drop")
        return jnp.where(ok, row, new_state.kf_assoc[kc])

    rows_new = jax.vmap(associate_into)(kc_slots, kc_ok)        # (F, N)
    # kc_slots is a slice of an argsort permutation → indices are distinct;
    # masked rows equal the original row, so the scatter is conflict-free
    new_state = new_state._replace(
        kf_assoc=new_state.kf_assoc.at[kc_slots].set(rows_new))

    if fidx is not None:
        from .member_index import fidx_add, fidx_set_rows
        # Ki gains the created points at their originating features, the
        # originating Kc rows at their matched features; then the F
        # re-association rows are rebuilt wholesale from their final
        # association rows (covers both the create_map_points kb writes and
        # the associate_into additions). All O(N)/O(F·N) — no full scatter.
        fidx = fidx_add(fidx, jnp.full((N,), ki, jnp.int32),
                        jnp.arange(N, dtype=jnp.int32),
                        jnp.where(created_mask, slots, 0), created_mask)
        fidx = fidx_add(fidx, kc_of, feat_kc,
                        jnp.where(created_mask, slots, 0), created_mask)
        fidx = fidx_set_rows(fidx, kc_slots, rows_new,
                             new_state.kf_kp_valid[kc_slots],
                             jnp.ones_like(kc_ok),
                             kf_valid=new_state.kf_valid)

    return NewPointsResult(
        state=new_state,
        created=jnp.sum(created_mask.astype(jnp.int32)),
        slots=jnp.where(created_mask, slots, -1),
        fidx=fidx,
    )
