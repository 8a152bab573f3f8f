"""Session IO: binary frame captures and map snapshots.

Replaces Serialization/ (BinarySerializer.h:19-75 versioned capture format,
magestream wrappers) and extends the reference's terminal-only Fossilize with
mid-run checkpoint/resume (SURVEY §5.4 notes the reference has none).
"""

from .capture import CaptureReader, CaptureWriter, CaptureHeader  # noqa: F401
from .sensor_log import SensorLogReader, SensorLogWriter  # noqa: F401
from .snapshot import load_session_snapshot, save_session_snapshot  # noqa: F401
