"""Loop closure: detect via place recognition, close via rigid correction +
map point merge + global BA.

Replaces Tasks/LoopClosureWorker.{h,cpp} + ThreadSafeMap::
FindNonCovisibleSimilarKeyframeClusters (ThreadSafeMap.cpp:422-…):

detect (LoopClosureWorker::DetectLoop, :108-161):
  1. BoW-score every keyframe against the new keyframe Ki; drop Ki and its
     covisible set (θ = CovisLoopThreshold); candidates must score at least
     as high as the lowest-scoring covisible keyframe (the reference's
     lowestCovisScore gate)
  2. cluster candidates by covisibility connectivity (label propagation over
     the covisibility matrix replaces GetCovisibilityConnectedSubGraphs);
     keep the biggest cluster of size ≥ MinClusterSize
  3. relocalize Ki's image against the cluster (FindLoopCandidates →
     TryEstimatePoseFromCandidates) and require track-local-map survival
     (SelectLoopClosureCandidateCluster, :286-331)
  4. scale from the summed depths of keypoints associated in BOTH the
     original and relocalized proxies (:297-312)

close (CloseLoop + CloseDetectedLoop, :163-208, :333-374):
  move Ki's covisible set by the relative correction T_ki⁻¹∘T_reloc, merge
  the duplicate map points revealed by the relocalized associations
  (UpdateKeyframesFromProxies merge semantics), then global BA with the
  loop-closure budget and batched pose-history re-derivation.

Rare-path policy: host-invoked jitted functions (the reference runs this on
its own thread with tracking reads interleaved; here tracking simply
continues until the host applies the new state).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ba.pose_graph import PoseGraphProblem, Sim3, optimize_pose_graph
from ..bow.index import BowIndex
from ..geometry.se3 import Pose
from ..tracking.frame_state import TrackedFrame
from ..tracking.relocalization import relocalize
from ..worldmap.covisibility import covisibility_matrix
from ..worldmap.map_state import MapState
from ..worldmap.operations import merge_map_points


class LoopDetection(NamedTuple):
    detected: jax.Array        # () bool
    reloc_pose: Pose           # Ki's pose in the loop region
    reloc_assoc: jax.Array     # (N,) int32 — Ki keypoints → cluster map points
    scale: jax.Array           # () f32 — relocDepth / currDepth
    cluster_mask: jax.Array    # (K,) bool
    # slot-identity captures for DEFERRED application (chunk/stream path):
    # between detection dispatch and apply, up to depth×chunk frames of
    # in-scan mapping may cull and RE-USE keyframe/point slots. A reused
    # slot still passes plain validity masks, so close_loop re-checks these
    # captures — keyframes by source frame id, points by creation epoch —
    # and drops any stale cluster member / merge pair. None (default) skips
    # the guards (synchronous application, or hand-built test detections).
    kf_frame_id: jax.Array | None = None   # (K,) int32 at dispatch
    mp_order: jax.Array | None = None      # (P,) int32 at dispatch


def _connected_components(adj: jax.Array, active: jax.Array, iters: int = 16) -> jax.Array:
    """Label propagation: (K,) int32 component label per active node (min
    reachable index). adj (K, K) bool symmetric."""
    K = adj.shape[0]
    labels = jnp.where(active, jnp.arange(K, dtype=jnp.int32), K)

    def body(_, lab):
        neigh = jnp.where(adj & active[None, :], lab[None, :], K)
        best = jnp.minimum(lab, jnp.min(neigh, axis=1))
        return jnp.where(active, best, K)

    return jax.lax.fori_loop(0, iters, body, labels)


def detect_loop(
    map_state: MapState,
    bow: BowIndex,
    frame: TrackedFrame,            # Ki's features + current pose + assoc
    ki: jax.Array,                  # () int32 keyframe slot of Ki
    key: jax.Array,
    covis_loop_threshold: int = 30,
    covis_cluster_threshold: int = 15,
    min_cluster_size: int = 3,
    min_keyframes: int = 10,
    max_candidates: int = 4,
    reloc_kwargs: dict | None = None,
) -> LoopDetection:
    K, P, N = map_state.capacity
    from ..bow.index import query_keyframes

    covis = covisibility_matrix(map_state)
    scores, _ = query_keyframes(bow, frame.desc, frame.kp_valid)

    is_self = jnp.arange(K) == ki
    covisible = (covis[ki] >= covis_loop_threshold) & map_state.kf_valid

    # lowestCovisScore gate: if no covisible keyframe scored, nothing qualifies
    any_covis = jnp.any(covisible)
    lowest_covis = jnp.min(jnp.where(covisible, scores, jnp.inf))
    good = (
        map_state.kf_valid & bow.kf_has
        & jnp.logical_not(covisible) & jnp.logical_not(is_self)
        & (scores >= lowest_covis) & any_covis
    )

    # clusters among good candidates
    adj = (covis >= covis_cluster_threshold)
    labels = _connected_components(adj, good)
    # biggest cluster
    counts = jnp.zeros((K + 1,), jnp.int32).at[labels].add(1)
    counts = counts.at[K].set(0)
    best_label = jnp.argmax(counts).astype(jnp.int32)
    cluster = good & (labels == best_label)
    cluster_size = jnp.sum(cluster.astype(jnp.int32))

    # top candidates inside the cluster by score
    cand_rank = jnp.argsort(-jnp.where(cluster, scores, -jnp.inf))
    cand = cand_rank[:max_candidates].astype(jnp.int32)
    cand_ok = cluster[cand]

    # relocalization + scale run ONLY when a qualifying cluster exists
    # (lax.cond) — the reference likewise returns from DetectLoop before
    # TryEstimatePoseFromCandidates when FindLoopCandidates comes back empty
    # (LoopClosureWorker.cpp:108-161). While exploring, no keyframe ever has
    # a non-covisible similar cluster, so every per-keyframe detection paid
    # the full RANSAC/guided-rematch cascade for a result already known to
    # be `detected = False`; the cheap branch skips it on-device.
    n_kf = jnp.sum(map_state.kf_valid.astype(jnp.int32))
    qualifies = (n_kf >= min_keyframes) & (cluster_size >= min_cluster_size)

    def run_reloc(_):
        r = relocalize(frame, map_state, cand, cand_ok, key,
                       **(reloc_kwargs or {}))

        # scale: shared keypoint indices associated in both views (:297-312)
        orig_assoc = frame.assoc
        both = (orig_assoc >= 0) & (r.assoc >= 0) & frame.kp_valid
        o_safe = jnp.where(both, orig_assoc, 0)
        r_safe = jnp.where(both, r.assoc, 0)
        curr_c = frame.pose.center()
        reloc_c = r.pose.center()
        curr_depth = jnp.sum(jnp.where(
            both,
            jnp.linalg.norm(map_state.mp_pos[o_safe] - curr_c[None], axis=-1),
            0.0))
        reloc_depth = jnp.sum(jnp.where(
            both,
            jnp.linalg.norm(map_state.mp_pos[r_safe] - reloc_c[None], axis=-1),
            0.0))
        # sanity gates beyond the reference's raw ratio: enough shared
        # keypoints for the sums to be meaningful, and a drift band no honest
        # monocular session exits (a ratio far outside it means a
        # degenerate/false reloc — applying it as a similarity would shred
        # the map)
        n_shared = jnp.sum(both.astype(jnp.int32))
        scale_ok = (curr_depth > 0) & (reloc_depth > 0) & (n_shared >= 8)
        scale = jnp.where(scale_ok,
                          reloc_depth / jnp.maximum(curr_depth, 1e-12), 1.0)
        scale_ok &= (scale > 0.25) & (scale < 4.0)
        scale = jnp.where(scale_ok, scale, 1.0)
        return r.pose, r.assoc, r.succeeded & scale_ok, scale

    def skip_reloc(_):
        N_feat = frame.assoc.shape[0]
        return (Pose(jnp.eye(3, dtype=jnp.float32),
                     jnp.zeros((3,), jnp.float32)),
                jnp.full((N_feat,), -1, jnp.int32),
                jnp.asarray(False), jnp.float32(1.0))

    reloc_pose, reloc_assoc, reloc_ok, scale = jax.lax.cond(
        qualifies, run_reloc, skip_reloc, operand=None)

    detected = qualifies & reloc_ok
    return LoopDetection(
        detected=detected, reloc_pose=reloc_pose, reloc_assoc=reloc_assoc,
        scale=scale, cluster_mask=cluster,
        kf_frame_id=map_state.kf_frame_id,
        mp_order=map_state.mp_created_order,
    )


def essential_graph_refine(
    state: MapState,
    pre_pose: Pose,
    move: jax.Array,
    cluster_mask: jax.Array,
    scale: jax.Array,
    ki: jax.Array,
    pre_covis: jax.Array | None = None,
    iterations: int = 12,
    covis_edge_threshold: int = 15,
    edges_per_kf: int = 4,
    loop_edge_weight: float = 5.0,
) -> MapState:
    """Distribute the loop error over the WHOLE trajectory with a Sim(3)
    pose graph (the OptimizeEssentialGraph role; BundlerLib declares the
    optimizer — PoseGraphOptimizer.h:18-65 — and ORB-SLAM defines the
    recipe). The closed-form correction in `close_loop` moves only Ki's
    covisible set; everything between the loop ends keeps its accumulated
    drift, which a reprojection-only global BA relaxes too slowly along the
    long scale-drift mode. The pose graph fixes exactly that mode:

      vertices   every keyframe as Sim(3); the corrected set enters at scale
                 1/s (the Sim3 world→cam form of the applied similarity),
                 the rest at their drifted SE(3) poses with s=1
      edges      temporal chain + top-C covisibility neighbours, measured
                 from the PRE-correction relative poses (locally accurate
                 odometry) — EXCEPT connections that only exist because the
                 merge fused the two loop ends (pre_covis below threshold),
                 which are measured from the corrected poses; plus a
                 loop-connection block anchor↔every corrected keyframe,
                 also measured from the corrected poses (it carries s).
                 The loop cluster is the fixed datum.
      apply      poses  T_j = [R_j | t_j / s_j];  points move with their
                 earliest observing keyframe:  p' = (G_opt⁻¹∘G_init)(p),
                 viewing ranges scale by the same correction

    state: post closed-form-correction + merge; pre_pose: poses before it;
    pre_covis: the PRE-merge covisibility matrix (distinguishes odometry-era
    connections from ones the closure itself created — measuring the latter
    from drifted poses would pull the graph straight back into the drift)."""
    K, P, N = state.capacity
    valid = state.kf_valid
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3))

    def _san(pose: Pose) -> Pose:
        return Pose(jnp.where(valid[:, None, None], pose.R, eye),
                    jnp.where(valid[:, None], pose.t, 0.0))

    post = _san(state.kf_pose)
    pre = _san(pre_pose)

    s_v = jnp.where(move & valid, 1.0 / jnp.maximum(scale, 1e-6), 1.0)
    verts = Sim3(s_v, post.R, s_v[:, None] * post.t)
    nc = Sim3(jnp.ones((K,), jnp.float32), pre.R, pre.t)

    # temporal chain: each keyframe → the latest earlier keyframe
    order = jnp.where(valid, state.kf_order, -1)
    earlier = (order[:, None] < order[None, :]) & valid[:, None] & valid[None, :]
    prev_order = jnp.where(earlier, order[:, None], -1)        # [i, j]
    prev = jnp.argmax(prev_order, axis=0).astype(jnp.int32)    # (K,)
    has_prev = jnp.any(earlier, axis=0)

    # strong covisibility edges: top-C neighbours per keyframe
    cv = covisibility_matrix(state)
    cv_ok = jnp.where(cv >= covis_edge_threshold, cv, 0)
    top_v, top_i = jax.lax.top_k(cv_ok, edges_per_kf)          # (K, C)
    cov_w = (top_v > 0).astype(jnp.float32)

    # loop anchor: the cluster keyframe Ki now shares the most points with
    in_cluster = cluster_mask & valid
    anchor_cv = jnp.argmax(jnp.where(in_cluster, cv[ki], -1)).astype(jnp.int32)
    anchor = jnp.where(jnp.any(in_cluster & (cv[ki] > 0)), anchor_cv,
                       jnp.argmax(in_cluster).astype(jnp.int32))

    C = edges_per_kf
    arange = jnp.arange(K, dtype=jnp.int32)
    # loop-connection block: anchor ↔ every corrected keyframe (ORB-SLAM's
    # LoopConnections — holds the whole corrected set to the fixed datum,
    # not just Ki, so chain edges into the drifted interior can't drag the
    # closure back out). Weighted above odometry edges: these come from a
    # RANSAC relocalization, the odometry edges from drifted dead-reckoning.
    loop_w = loop_edge_weight * (
        move & valid & (arange != anchor)).astype(jnp.float32)
    edge_i = jnp.concatenate([prev, top_i.reshape(-1),
                              jnp.full((K,), anchor, jnp.int32)])
    edge_j = jnp.concatenate([arange, jnp.repeat(arange, C), arange])
    w = jnp.concatenate([
        (has_prev & valid).astype(jnp.float32),
        cov_w.reshape(-1),
        loop_w,
    ])
    # dead edges pin to vertex 0 with identity measurement (zero residual)
    dead = w <= 0.0
    edge_i = jnp.where(dead, 0, edge_i)
    edge_j = jnp.where(dead, 0, edge_j)

    # measurement source per edge: drifted odometry (nc) for connections
    # that predate the closure; corrected poses (verts) for connections the
    # merge created and for the loop block
    if pre_covis is None:
        cov_new = jnp.zeros((K, C), bool)
    else:
        cov_new = pre_covis[arange[:, None], top_i] < covis_edge_threshold
    from_corrected = jnp.concatenate([
        jnp.zeros((K,), bool),
        cov_new.reshape(-1),
        jnp.ones((K,), bool),
    ])

    def _rel(src: Sim3) -> Sim3:
        gi = jax.tree.map(lambda a: a[edge_i], src)
        gj = jax.tree.map(lambda a: a[edge_j], src)
        return gj.compose(gi.inverse())                        # i→j

    meas_pre, meas_post = _rel(nc), _rel(verts)
    meas = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(from_corrected,
                        from_corrected.shape + (1,) * (a.ndim - 1)), b, a),
        meas_pre, meas_post)
    ident = Sim3(jnp.float32(1.0), jnp.eye(3, dtype=jnp.float32),
                 jnp.zeros((3,), jnp.float32))
    meas = jax.tree.map(
        lambda m, idv: jnp.where(
            jnp.reshape(dead, dead.shape + (1,) * (m.ndim - 1)), idv, m),
        meas, ident)

    problem = PoseGraphProblem(
        vertices=verts, fixed=in_cluster, valid=valid,
        edge_i=edge_i, edge_j=edge_j, edge_meas=meas, edge_weight=w,
    )
    opt = optimize_pose_graph(problem, iterations=iterations)

    # keyframe poses: T_j = [R | t / s]
    new_pose = Pose(
        jnp.where(valid[:, None, None], opt.R, state.kf_pose.R),
        jnp.where(valid[:, None],
                  opt.t / jnp.maximum(opt.s, 1e-6)[:, None], state.kf_pose.t),
    )

    # points ride a reference keyframe: p' = (G_opt⁻¹ ∘ G_init)(p). The ref
    # must live in the same frame the point currently does (ORB-SLAM's
    # mnCorrectedByKF guard): cluster observers first (datum — identity
    # correction, loop points stay put), then moved observers (close_loop
    # already put both in the corrected frame), else the earliest (drifted)
    # observer. Riding the earliest observer unconditionally would apply a
    # drifted→refined correction on top of points close_loop already moved.
    corr = opt.inverse().compose(verts)                        # (K,) Sim3
    obs = state.kf_member & valid[:, None]                     # (K, P)
    prio = jnp.where(in_cluster, 0, jnp.where(move & valid, 1, 2))
    key = prio.astype(jnp.int32) * jnp.int32(2**24) + state.kf_order
    ref_key = jnp.where(obs, key[:, None], jnp.int32(2**30))
    ref = jnp.argmin(ref_key, axis=0).astype(jnp.int32)        # (P,)
    has_ref = jnp.any(obs, axis=0) & state.mp_valid
    cr = jax.tree.map(lambda a: a[ref], corr)
    p_new = cr.s[:, None] * jnp.einsum(
        "pij,pj->pi", cr.R, state.mp_pos) + cr.t
    return state._replace(
        kf_pose=new_pose,
        mp_pos=jnp.where(has_ref[:, None], p_new, state.mp_pos),
        mp_dmin=jnp.where(has_ref, cr.s * state.mp_dmin, state.mp_dmin),
        mp_dmax=jnp.where(has_ref, cr.s * state.mp_dmax, state.mp_dmax),
    )


def close_loop(
    map_state: MapState,
    detection: LoopDetection,
    frame: TrackedFrame,
    ki: jax.Array,
    covis_theta: int = 15,
    essential_graph_iters: int = 0,
) -> MapState:
    """Apply the loop as a SIMILARITY correction (rotation + translation +
    scale) and merge duplicated map points. (The subsequent global BA — run
    by the caller — distributes the residual loop error, matching the
    reference which runs a full global BA instead of a Sim3 pose graph,
    SURVEY §2.2 BundlerLib note.)

    The reference carries `SimilarityScale` = relocDepth/currDepth alongside
    the unscaled transform (LoopClosureWorker.cpp:296-331) and relies on
    per-keyframe re-estimation + global BA to absorb it; here the Sim(3) is
    applied in closed form, which corrects monocular scale drift directly:

      world similarity  x' = R_r^T (s (R_k x + t_k) - t_r)
      keyframe poses    R_j' = R_j R_k^T R_r,
                        t_j' = R_j R_k^T (t_r - s t_k) + s t_j

    where (R_k, t_k) is Ki's drifted pose, (R_r, t_r) the relocalized pose,
    s the depth-ratio scale. The anchor Ki lands exactly on the relocalized
    pose; s = 1 reduces to the rigid correction. Points moved are those
    observed by the moving covisible set and NOT already part of the loop
    cluster (the loop region is the fixed datum, ORB-SLAM CorrectLoop
    semantics); their dMin/dMax viewing ranges scale by s."""
    K, P, N = map_state.capacity
    # identity-unchanged guards for deferred application (see LoopDetection):
    # a cluster keyframe slot culled+reused since dispatch must not serve as
    # the fixed datum, and a point slot reused must not merge.
    cluster_mask = detection.cluster_mask
    if detection.kf_frame_id is not None:
        cluster_mask = cluster_mask & (
            map_state.kf_frame_id == detection.kf_frame_id)
    mp_same = (jnp.ones((P,), bool) if detection.mp_order is None
               else map_state.mp_created_order == detection.mp_order)
    pre_pose = map_state.kf_pose
    covis = covisibility_matrix(map_state)
    move = ((covis[ki] >= covis_theta) | (jnp.arange(K) == ki)) & map_state.kf_valid

    s = detection.scale
    R_k = map_state.kf_pose.R[ki]
    t_k = map_state.kf_pose.t[ki]
    R_r = detection.reloc_pose.R
    t_r = detection.reloc_pose.t

    # keyframe similarity correction (per keyframe j, batched over K)
    corr_R = R_k.T @ R_r                                   # (3,3)
    corr_v = R_k.T @ (t_r - s * t_k)                       # (3,)
    R_new = jnp.einsum("kij,jl->kil", map_state.kf_pose.R, corr_R)
    t_new = (jnp.einsum("kij,j->ki", map_state.kf_pose.R, corr_v)
             + s * map_state.kf_pose.t)
    new_pose = Pose(
        jnp.where(move[:, None, None], R_new, map_state.kf_pose.R),
        jnp.where(move[:, None], t_new, map_state.kf_pose.t),
    )

    # map points owned by the moving set (and not by the loop cluster) follow
    # the same similarity; loop-region points are the fixed datum
    member = map_state.kf_member                           # (K, P) bool
    seen_by_moved = jnp.any(member & move[:, None], axis=0)
    seen_by_cluster = jnp.any(member & cluster_mask[:, None], axis=0)
    move_pt = map_state.mp_valid & seen_by_moved & jnp.logical_not(seen_by_cluster)
    cam_k = s * (map_state.mp_pos @ R_k.T + t_k)           # (P, 3)
    pos_new = (cam_k - t_r) @ R_r                          # rows ⋅ R_r = R_r^T x
    map_state = map_state._replace(
        kf_pose=new_pose,
        mp_pos=jnp.where(move_pt[:, None], pos_new, map_state.mp_pos),
        mp_dmin=jnp.where(move_pt, s * map_state.mp_dmin, map_state.mp_dmin),
        mp_dmax=jnp.where(move_pt, s * map_state.mp_dmax, map_state.mp_dmax),
    )

    # merge: Ki keypoints associated to BOTH an old local point and a cluster
    # point are duplicates — retarget local → cluster point. Both slots must
    # still be live: with deferred detection (chunk/stream resolution) the
    # map may have culled either side between dispatch and apply.
    both = (frame.assoc >= 0) & (detection.reloc_assoc >= 0) & frame.kp_valid
    src = jnp.where(both, frame.assoc, 0)
    dst = jnp.where(both, detection.reloc_assoc, 0)
    different = (both & (src != dst)
                 & map_state.mp_valid[src] & map_state.mp_valid[dst]
                 & mp_same[src] & mp_same[dst])
    map_state = merge_map_points(map_state, src, dst, different)

    # distribute the remaining drift over the whole trajectory (Sim(3)
    # essential graph) before the caller's global BA polishes
    if essential_graph_iters > 0:
        map_state = essential_graph_refine(
            map_state, pre_pose, move, cluster_mask,
            detection.scale, ki, pre_covis=covis,
            iterations=essential_graph_iters,
            covis_edge_threshold=covis_theta,
        )
    return map_state
