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

    r = relocalize(frame, map_state, cand, cand_ok, key, **(reloc_kwargs or {}))

    # scale: shared keypoint indices associated in both views (:297-312)
    orig_assoc = frame.assoc
    both = (orig_assoc >= 0) & (r.assoc >= 0) & frame.kp_valid
    o_safe = jnp.where(both, orig_assoc, 0)
    r_safe = jnp.where(both, r.assoc, 0)
    curr_c = frame.pose.center()
    reloc_c = r.pose.center()
    curr_depth = jnp.sum(jnp.where(
        both, jnp.linalg.norm(map_state.mp_pos[o_safe] - curr_c[None], axis=-1), 0.0))
    reloc_depth = jnp.sum(jnp.where(
        both, jnp.linalg.norm(map_state.mp_pos[r_safe] - reloc_c[None], axis=-1), 0.0))
    scale_ok = (curr_depth > 0) & (reloc_depth > 0)
    scale = jnp.where(scale_ok, reloc_depth / jnp.maximum(curr_depth, 1e-12), 1.0)

    n_kf = jnp.sum(map_state.kf_valid.astype(jnp.int32))
    detected = (
        (n_kf >= min_keyframes)
        & (cluster_size >= min_cluster_size)
        & r.succeeded
        & scale_ok
    )
    return LoopDetection(
        detected=detected, reloc_pose=r.pose, reloc_assoc=r.assoc,
        scale=scale, cluster_mask=cluster,
    )


def close_loop(
    map_state: MapState,
    detection: LoopDetection,
    frame: TrackedFrame,
    ki: jax.Array,
    covis_theta: int = 15,
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
    seen_by_cluster = jnp.any(member & detection.cluster_mask[:, None], axis=0)
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
    # point are duplicates — retarget local → cluster point
    both = (frame.assoc >= 0) & (detection.reloc_assoc >= 0) & frame.kp_valid
    src = jnp.where(both, frame.assoc, 0)
    dst = jnp.where(both, detection.reloc_assoc, 0)
    different = both & (src != dst)
    map_state = merge_map_points(map_state, src, dst, different)
    return map_state
