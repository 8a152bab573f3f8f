from . import anms, fast, frontend, image, orb  # noqa: F401
from .frontend import FrameFeatures, detect_and_compute  # noqa: F401
