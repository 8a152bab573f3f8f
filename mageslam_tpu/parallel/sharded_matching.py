"""Within-frame model parallelism: the map-point bank sharded across chips.

The session-parallel path (`multi_session`) scales over independent sessions;
this module scales a SINGLE large-map session: the (P, ·) map-point arrays
are sharded over the mesh's 'model' axis, each chip computes the guided-match
candidate scores for its point shard ((P/d, N) Hamming + gates + per-keypoint
best), and the per-keypoint winner combines across chips with one all_gather
of (d, 3, N) reduction operands — collectives ride ICI.

This is the TP analog for SLAM: the biggest per-frame tensors (point bank,
distance matrices) partition over chips while each frame's keypoint set stays
replicated. Equivalent output to ops.matching.radius_match + dedup over the
full bank (validated against it in tests on the virtual CPU mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.matching import BIG, hamming_matrix


def _local_best(q_desc, q_xy, q_valid, t_desc, t_xy, t_valid,
                radius, max_hamming):
    """Per-target best and second-best over THIS shard's queries.
    Returns (best (N,), best_q (N,), second (N,))."""
    d = hamming_matrix(q_desc, t_desc)
    dx = jnp.abs(q_xy[:, None, 0] - t_xy[None, :, 0])
    dy = jnp.abs(q_xy[:, None, 1] - t_xy[None, :, 1])
    ok = (dx <= radius) & (dy <= radius) & q_valid[:, None] & t_valid[None, :]
    d = jnp.where(ok & (d <= max_hamming), d, BIG)
    # per-target (column) best/second over this shard
    best = jnp.min(d, axis=0)
    best_q = jnp.argmin(d, axis=0).astype(jnp.int32)
    d2 = d.at[best_q, jnp.arange(d.shape[1])].set(BIG)
    second = jnp.min(d2, axis=0)
    return best, best_q, second


def make_sharded_guided_matcher(mesh: Mesh, axis: str = "model"):
    """Returns match(q_desc, q_xy, q_valid, t_desc, t_xy, t_valid, radius,
    max_hamming, min_diff) with the QUERY (map-point) axis sharded over
    `axis`. Output: per-target best query index into the FULL bank (or -1),
    replicated."""

    def kernel(q_desc, q_xy, q_valid, t_desc, t_xy, t_valid,
               radius, max_hamming, min_diff):
        shard = jax.lax.axis_index(axis)
        n_shards = jax.lax.axis_size(axis)
        p_local = q_desc.shape[0]

        best, best_q, second = _local_best(
            q_desc, q_xy, q_valid, t_desc, t_xy, t_valid, radius, max_hamming)
        best_global_q = best_q + shard * p_local

        ops = jnp.stack([best.astype(jnp.float32),
                         best_global_q.astype(jnp.float32),
                         second.astype(jnp.float32)])          # (3, N)
        gathered = jax.lax.all_gather(ops, axis)               # (d, 3, N)
        bests = gathered[:, 0, :]                              # (d, N)
        idxs = gathered[:, 1, :].astype(jnp.int32)
        seconds = gathered[:, 2, :]

        order = jnp.argsort(bests, axis=0)
        b1 = jnp.take_along_axis(bests, order[:1], axis=0)[0]
        b2_cand = jnp.take_along_axis(bests, order[1:2], axis=0)[0] \
            if bests.shape[0] > 1 else jnp.full_like(b1, BIG)
        win = jnp.take_along_axis(idxs, order[:1], axis=0)[0]
        win_second = jnp.take_along_axis(seconds, order[:1], axis=0)[0]
        b2 = jnp.minimum(b2_cand, win_second)

        ok = (b1 <= max_hamming) & ((b2 >= BIG) | (b2 - b1 > min_diff))
        return jnp.where(ok, win, -1)

    shard_q = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    mapped = jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P(), P(), P()),
        out_specs=P(),
        # the all_gather-then-reduce output is replicated by construction;
        # the varying-mesh-axes checker cannot infer that
        check_vma=False,
    )

    @jax.jit
    def match(q_desc, q_xy, q_valid, t_desc, t_xy, t_valid,
              radius, max_hamming, min_diff):
        q_desc = jax.device_put(q_desc, shard_q)
        q_xy = jax.device_put(q_xy, shard_q)
        q_valid = jax.device_put(q_valid, shard_q)
        return mapped(q_desc, q_xy, q_valid,
                      jax.device_put(t_desc, rep), jax.device_put(t_xy, rep),
                      jax.device_put(t_valid, rep),
                      jnp.float32(radius), jnp.int32(max_hamming),
                      jnp.int32(min_diff))

    return match
