"""mageslam_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of MAGE-SLAM's capabilities.

A real-time monocular/stereo visual(-inertial) SLAM framework, designed TPU-first:
the ORB front end, Hamming matching, and Levenberg-Marquardt bundle adjustment run
as fixed-shape batched kernels; the reference's multi-threaded pipeline becomes a
deterministic phase schedule inside compiled step functions.

Reference: microsoft/mageslam (C++; see SURVEY.md for the structural map).
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry is precision-critical: on TPU the default matmul precision for
# f32 inputs is bfloat16, which silently destroys pose/triangulation/BA numerics
# (observed: 0.25-unit triangulation error vs 3e-5 at f32). Force f32 everywhere;
# throughput-critical kernels (descriptor Hamming-matmuls etc.) opt into bf16
# explicitly by casting their inputs.
_jax.config.update("jax_default_matmul_precision", "float32")

from .config import MageSlamSettings, golden_path_settings, load_settings  # noqa: F401

from .runtime import FrameResult, SlamSession, TrackingState  # noqa: E402,F401
