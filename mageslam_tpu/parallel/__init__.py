"""Multi-chip scaling via jax.sharding.

The reference is strictly single-process (SURVEY §2.4/§5.8) — its
"distributed backend" is three OS threads. The TPU rebuild's scaling axes:

  - **session parallelism (DP)**: a batch of independent SLAM sessions
    sharded across chips — the natural serving shape (many cameras/users).
  - **within-frame sharding (TP analog)**: the big contractions sharded over
    the map-point dimension — guided matching (`sharded_matching`) and the
    global-BA Schur system (`sharded_ba`), for large-map configurations.
  - **pipeline parallelism**: per-keyframe mapping offloaded to a second
    device overlapping tracking (`SlamSession.enable_mapping_offload`).

All collectives ride ICI via XLA GSPMD; there is no hand-written NCCL/MPI
to translate.
"""

from .multi_session import batched_track_step, make_session_mesh  # noqa: F401
from .sharded_ba import make_sharded_lm_iteration, make_sharded_lm_solver  # noqa: F401
from .sharded_matching import make_sharded_guided_matcher  # noqa: F401
