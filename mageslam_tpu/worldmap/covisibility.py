"""Covisibility as dense masked matrix ops.

Replaces Map/CovisibilityGraph.{h,cpp} (Eigen::SparseCore adjacency, edge when
≥θ shared map points, θ=15 — MageSettings.h:74) and Map/SpanningTree: on TPU
the (K, K) shared-observation count matrix is one matmul over the membership
matrix, recomputed when needed. The spanning tree existed to give loop closure
an essential-graph backbone; the golden path only uses covisibility queries
(SURVEY §7.1 step 6), which the count matrix answers directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .map_state import MapState, point_keyframe_matrix


def membership_matrix(state: MapState) -> jax.Array:
    """(K, P) bool: keyframe k observes point p."""
    return point_keyframe_matrix(state)


def covisibility_matrix(state: MapState, member: jax.Array | None = None) -> jax.Array:
    """(K, K) int32 shared-map-point counts (CovisibilityGraph edge weights).
    Diagonal is zeroed; invalid keyframes have zero rows/cols."""
    m = member if member is not None else membership_matrix(state)
    # int8 operands with an int32 accumulator: exact counts (≤ N < 2^31),
    # rides the MXU's int8 path and converts 4× less HBM traffic than the
    # old f32 form (the matmul runs 3× per mapping event — measured 1.25 ms
    # each as f32 at (256, 8192))
    mi = m.astype(jnp.int8)
    counts = jax.lax.dot_general(
        mi, mi, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    K = counts.shape[0]
    counts = counts * (1 - jnp.eye(K, dtype=jnp.int32))
    valid = state.kf_valid.astype(jnp.int32)
    return counts * valid[:, None] * valid[None, :]


def connected_keyframes(covis: jax.Array, kf_idx: jax.Array, theta: jax.Array) -> jax.Array:
    """(K,) bool — keyframes sharing ≥ theta map points with `kf_idx`
    (CovisibilityGraph::GetConnectedKeyframes; default θ from
    CovisibilitySettings.CovisThreshold)."""
    return covis[kf_idx] >= theta
