"""Runtime: the per-frame SLAM pipeline and public facade.

Replaces Core/MAGESLAM/Source/Tasks (Runtime, the worker classes, the state
machine schedule) and MageSlam.{h,cpp}. The reference's 3-thread pipeline with
named rendezvous states (SURVEY §3.3) collapses into an explicit phase order:
analyze → (init | track) → [keyframe? → mapping phases] — the state machine
proved these interleave at well-defined points, so a serialized schedule
reproduces its semantics. Rare paths (initialization, relocalization, loop
closure) are separately-jitted functions invoked from the host when flags
fire, mirroring the reference's own async split.
"""

from .pipeline import SlamSession, TrackingState, FrameResult  # noqa: F401
from .pose_history import PoseHistory  # noqa: F401
