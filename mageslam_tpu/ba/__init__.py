"""Bundle adjustment: batched Levenberg-Marquardt replacing BundlerLib/g2o.

The reference's only numeric optimizer is BundlerLib (Dependencies/BundlerLib),
a thin wrapper over g2o LM with a dense linear solver (BundlerLib.cpp:188-190).
Here the same problem classes become fixed-shape batched linear algebra:

  - `residuals`   — reprojection + tether residuals and analytic Jacobians
  - `pose_only`   — motion-only LM (1 camera, fixed points): the tracking hot path
  - `schur`       — full BA: Schur-complement reduced camera system, dense solve
  - `step`        — StepBundleAdjustment semantics (Huber schedule, outlier
                    extraction with behind-camera test, persistent lambda)
"""

from .pose_graph import PoseGraphProblem, Sim3, optimize_pose_graph  # noqa: F401
from .problem import BAProblem, BAState  # noqa: F401
from .pose_only import optimize_pose  # noqa: F401
from .step import step_bundle_adjust  # noqa: F401
