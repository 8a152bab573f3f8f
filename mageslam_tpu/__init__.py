"""mageslam_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of MAGE-SLAM's capabilities.

A real-time monocular/stereo visual(-inertial) SLAM framework, designed TPU-first:
the ORB front end, Hamming matching, and Levenberg-Marquardt bundle adjustment run
as fixed-shape batched kernels; the reference's multi-threaded pipeline becomes a
deterministic phase schedule inside compiled step functions.

Reference: microsoft/mageslam (C++; see SURVEY.md for the structural map).
"""

__version__ = "0.1.0"

from .config import MageSlamSettings, golden_path_settings, load_settings  # noqa: F401
