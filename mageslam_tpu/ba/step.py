"""StepBundleAdjustment semantics (BundlerLib.cpp:364-446), fixed-shape.

One call = one LM iteration per entry of the Huber-width schedule, followed by
outlier extraction: an observation is removed (its information zeroed — the
array equivalent of g2o removeEdge) when its *unweighted* squared pixel error
exceeds maxErrorSquare, or its point projects behind the camera
(BundlerLib.cpp:388-436). Returns the mean square error over survivors, like
the reference's return value.

The driver loop (BundleAdjustTask::IterateBundleAdjust,
BundleAdjustment/BundleAdjust.cpp + Tasks/MappingWorker.cpp:330-371) shrinks
the Huber width and outlier threshold between calls and persists lambda —
that policy lives in the caller; this module is the per-call primitive.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .problem import BAProblem, BAState
from .residuals import observation_residuals
from .schur import lm_iteration


@partial(jax.jit, static_argnames=("num_inner_steps",))
def step_bundle_adjust(
    problem: BAProblem,
    state: BAState,
    huber_widths: jax.Array,      # (num_inner_steps,) f32 — one LM iteration each
    max_error_square: jax.Array,  # () f32
    num_inner_steps: int | None = None,
) -> tuple[BAState, jax.Array, jax.Array]:
    """Returns (new_state, mean_square_error, newly_outlier_mask (O,) bool)."""
    del num_inner_steps  # shape of huber_widths is static already

    def body(st, hw):
        res = lm_iteration(problem, st, hw)
        return res.state, res.cost

    state, _ = jax.lax.scan(body, state, huber_widths)

    # outlier extraction at the final estimate, huber width irrelevant for chi2
    obs = observation_residuals(problem, state.poses, state.points, state.obs_info,
                                jnp.float32(0.0))
    sum_sq = jnp.sum(obs.r * obs.r, axis=-1)          # unweighted, like errorData()
    active = state.obs_info > 0
    is_outlier = active & ((obs.depth <= 0.0) | (sum_sq > max_error_square))
    survivors = active & jnp.logical_not(is_outlier)
    mse = jnp.sum(jnp.where(survivors, sum_sq, 0.0)) / jnp.maximum(
        jnp.sum(survivors.astype(jnp.float32)), 1.0
    )
    new_state = state._replace(obs_info=jnp.where(is_outlier, 0.0, state.obs_info))
    return new_state, mse, is_outlier


def iterate_bundle_adjust(
    problem: BAProblem,
    state: BAState,
    huber_width: float,
    max_outlier_error: float,
    huber_width_scale: float,
    max_outlier_error_scale: float,
    min_mean_square_error: float,
    num_steps: int,
    steps_per_run: int = 1,
    min_steps: int = 0,
    step_fn=None,
):
    """The BundleAdjustTask driver policy: repeatedly call step_bundle_adjust
    with geometrically shrinking Huber width and outlier threshold, iterating
    while total steps < NumSteps AND (MSE > MinMeanSquareError OR total steps
    < MinSteps) — the shouldKeepIterating condition of the reference's
    mapping BA loop (Tasks/MappingWorker.cpp:357-361, BundleAdjust.h:202-244).

    Host-side loop (the reference interleaves map write-backs between runs;
    here callers are host-gated rare paths — loop-closure close and
    fossilize); each inner call is one compiled step. Returns
    (state, mse, steps_taken, cumulative_outlier_mask (O,) bool).

    `step_fn` swaps the per-call primitive — same (problem, state, widths,
    max_err_sq) → (state, mse, outliers) contract — e.g. the point-sharded
    multi-chip step (parallel.sharded_ba.make_sharded_step_bundle_adjust).
    """
    if step_fn is None:
        step_fn = step_bundle_adjust
    active0 = state.obs_info > 0
    hw = float(huber_width)
    moe = float(max_outlier_error)
    mse = float("inf")
    steps = 0
    while steps < num_steps:
        widths = hw * (
            huber_width_scale ** jnp.arange(steps_per_run, dtype=jnp.float32))
        state, mse_d, _ = step_fn(
            problem, state, widths, jnp.float32(moe * moe))
        hw *= huber_width_scale ** steps_per_run
        moe *= max_outlier_error_scale ** steps_per_run
        steps += steps_per_run
        mse = float(mse_d)
        if steps >= min_steps and mse < min_mean_square_error:
            break
    outliers = active0 & jnp.logical_not(state.obs_info > 0)
    return state, mse, steps, outliers
