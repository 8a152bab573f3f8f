"""Maximum-covisibility spanning tree (the essential-graph backbone).

Replaces Map/SpanningTree.{h,cpp} (580 LoC): the reference maintains a
spanning tree over keyframes where each edge is the strongest covisibility
link, repaired incrementally on keyframe removal. The golden path never
consumes it (SURVEY §7.1 step 6), but it is part of the map API surface
(essential-graph export, future pose-graph optimization).

TPU form: recomputed from the covisibility matrix by a batched Prim's
algorithm — K iterations of a masked argmax over the (K, K) weight matrix
(fori_loop; each step adds the strongest edge from the tree to a non-tree
keyframe). Incremental repair is unnecessary when the full rebuild is one
small compiled loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spanning_tree(covis: jax.Array, kf_valid: jax.Array,
                  root: jax.Array | int = 0) -> jax.Array:
    """(K,) int32 parent index per keyframe (-1 for the root and for invalid
    or disconnected keyframes). Edges maximize covisibility weight."""
    K = covis.shape[0]
    root = jnp.asarray(root, jnp.int32)
    w = jnp.where(kf_valid[:, None] & kf_valid[None, :], covis, -1)

    in_tree0 = jnp.zeros((K,), bool).at[root].set(kf_valid[root])
    parent0 = jnp.full((K,), -1, jnp.int32)

    def body(_, carry):
        in_tree, parent = carry
        # candidate edges: tree → non-tree with positive weight
        cand = jnp.where(in_tree[:, None] & ~in_tree[None, :] & (w > 0), w, -1)
        flat = jnp.argmax(cand)
        i, j = flat // K, flat % K
        ok = cand[i, j] > 0
        parent = parent.at[j].set(jnp.where(ok, i.astype(jnp.int32), parent[j]))
        in_tree = in_tree.at[j].set(jnp.where(ok, True, in_tree[j]))
        return in_tree, parent

    _, parent = jax.lax.fori_loop(0, K - 1, body, (in_tree0, parent0))
    return parent


def tree_valid(parent: jax.Array, kf_valid: jax.Array,
               root: jax.Array | int = 0) -> jax.Array:
    """SpanningTree::ValidSpanningTree analogue: every valid keyframe (except
    the root) reachable from the root. () bool."""
    K = parent.shape[0]
    root = jnp.asarray(root, jnp.int32)
    reach0 = jnp.zeros((K,), bool).at[root].set(True)

    def body(_, reach):
        has_parent = parent >= 0
        p_safe = jnp.where(has_parent, parent, 0)
        return reach | (has_parent & reach[p_safe])

    reach = jax.lax.fori_loop(0, K, body, reach0)
    return jnp.all(jnp.where(kf_valid, reach, True))


def essential_graph_edges(covis: jax.Array, kf_valid: jax.Array,
                          parent: jax.Array,
                          theta: int = 100) -> jax.Array:
    """(K, K) bool — the essential graph: spanning-tree edges plus strong
    covisibility edges (CovisEssentialThreshold, MageSettings.h:76)."""
    K = covis.shape[0]
    strong = (covis >= theta) & kf_valid[:, None] & kf_valid[None, :]
    idx = jnp.arange(K)
    has_p = parent >= 0
    p_safe = jnp.where(has_p, parent, 0)
    tree = jnp.zeros((K, K), bool).at[idx, p_safe].max(has_p)
    tree = tree | tree.T
    return strong | tree
