"""Per-frame tracking: motion prior, guided pose estimation, local-map pose
refinement, keyframe decision.

Replaces Core/MAGESLAM/Source/Tracking/{PoseEstimator, TrackLocalMap,
NewKeyFrameDecision, KeyframeBuilder} with batched fixed-shape computations:
the per-map-point loops become whole-bank masked array ops, the R*-tree
guided matches become dense distance-matrix selections, and the pose-only
g2o optimizations become `ba.pose_only.optimize_pose`.
"""

from .frame_state import TrackedFrame, TrackingHistory  # noqa: F401
from .pose_estimation import estimate_next_pose_from_history, estimate_pose_with_prior  # noqa: F401
from .track_local_map import track_local_map  # noqa: F401
from .keyframe_decision import is_new_keyframe  # noqa: F401
