"""Diagnostics: determinism tracing, metric channels, structured inspection.

Replaces the reference's observability stack (SURVEY §5.1/§5.5):
  - arcana `determinator` (analysis/determinator.h:16-61) → `trace.Determinator`:
    CRC32 hashes of pipeline intermediates, recordable and replay-comparable
  - `FIRE_OBJECT_TRACE` channels (analysis/object_trace.h) → `trace.MetricChannels`
  - SkeletonKey/SkeletonLogger (Debugging/) → `introspect.Introspection`:
    leveled structured dumps + live state access fan-out
  - arcana xray (analysis/xray.h:28-43) + DataFlow (Analysis/DataFlow.h:14-66)
    → `xray.XRay`: full per-stage input/output pytree dumps as JSON, with
    `diff_dumps` for the offline-diff workflow
"""

from .trace import Determinator, MetricChannels, hash_tree  # noqa: F401
from .introspect import Introspection, LogLevel  # noqa: F401
from .xray import XRay, diff_dumps  # noqa: F401
