from . import camera, epipolar, se3, triangulation
from .se3 import Pose

__all__ = ["Pose", "camera", "epipolar", "se3", "triangulation"]
