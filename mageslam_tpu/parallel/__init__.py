"""Multi-chip scaling via jax.sharding.

The reference is strictly single-process (SURVEY §2.4/§5.8) — its
"distributed backend" is three OS threads. The TPU rebuild's scaling axes:

  - **session parallelism (DP)**: a batch of independent SLAM sessions
    sharded across chips — the natural serving shape (many cameras/users).
  - **within-frame sharding (TP analog)**: the big per-frame contractions
    (Hamming matrices, Schur einsum) sharded over the map-point dimension —
    planned for large-map configurations.

All collectives ride ICI via XLA GSPMD; there is no hand-written NCCL/MPI
to translate.
"""

from .multi_session import batched_track_step, make_session_mesh  # noqa: F401
