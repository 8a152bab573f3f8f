"""Determinism tracing + metric channels.

The reference's `mira::determinator` CRC32-hashes intermediate state at ~40
pipeline callsites; debug builds record the hash stream so a later run can be
byte-compared against the recording (analysis/determinator.h:16-61 — the
substitute for distributed-test fixtures: correctness = bit-identical replay,
SURVEY §4). `FIRE_OBJECT_TRACE` publishes typed per-frame metric points
(analysis/object_trace.h, Analysis/DataPoints.h:14-32).

TPU form: `hash_tree` CRCs the host copy of any pytree (device arrays are
fetched once per checkpoint — diagnostics are off the hot path and opt-in,
like the reference's debug-only macros).
"""

from __future__ import annotations

import json
import zlib
from collections import defaultdict
from typing import Any, Callable

import numpy as np
import jax


def hash_tree(tree: Any) -> int:
    """CRC32 over the bytes of every leaf (deterministic leaf order)."""
    crc = 0
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        crc = zlib.crc32(arr.tobytes(), crc)
        crc = zlib.crc32(str(arr.dtype).encode(), crc)
        crc = zlib.crc32(str(arr.shape).encode(), crc)
    return crc


class Determinator:
    """DETERMINISTIC_CHECK equivalent: in `record` mode append hashes; in
    `verify` mode compare each checkpoint against the recording and collect
    divergences (checkpoint name + index of first mismatch)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._stream: list[tuple[str, int]] = []
        self._expected: list[tuple[str, int]] | None = None
        self._cursor = 0
        self.divergences: list[dict] = []

    def check(self, name: str, *trees: Any) -> None:
        if not self.enabled:
            return
        h = 0
        for t in trees:
            h = (h * 1000003 + hash_tree(t)) & 0xFFFFFFFF
        self._stream.append((name, h))
        if self._expected is not None:
            if self._cursor >= len(self._expected):
                self.divergences.append(
                    {"index": self._cursor, "name": name, "reason": "extra checkpoint"})
            else:
                exp_name, exp_hash = self._expected[self._cursor]
                if exp_name != name or exp_hash != h:
                    self.divergences.append({
                        "index": self._cursor, "name": name,
                        "expected": [exp_name, exp_hash], "got": [name, h],
                    })
            self._cursor += 1

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self._stream, f)

    def load_for_verify(self, path: str) -> None:
        with open(path) as f:
            self._expected = [tuple(x) for x in json.load(f)]
        self._cursor = 0
        self.divergences = []

    @property
    def is_deterministic(self) -> bool:
        return not self.divergences


class MetricChannels:
    """FIRE_OBJECT_TRACE: named channels of (frame_id, value) points with
    optional subscriber callbacks."""

    def __init__(self):
        self._points: dict[str, list[tuple[int, float]]] = defaultdict(list)
        self._subs: dict[str, list[Callable[[int, float], None]]] = defaultdict(list)

    def fire(self, channel: str, frame_id: int, value: float) -> None:
        self._points[channel].append((int(frame_id), float(value)))
        for cb in self._subs[channel]:
            cb(int(frame_id), float(value))

    def subscribe(self, channel: str, cb: Callable[[int, float], None]) -> None:
        self._subs[channel].append(cb)

    def points(self, channel: str) -> list[tuple[int, float]]:
        return list(self._points[channel])

    def channels(self) -> list[str]:
        return sorted(self._points)


def xray(name: str, sink: list | None = None):
    """XRAY_FUNCTION equivalent (arcana/analysis/xray.h:28-43): decorator
    dumping a function's inputs and outputs as JSON-able records for offline
    diffing. Arrays are summarized as (shape, dtype, crc32) to keep records
    bounded; pass a list `sink` to collect records, else they accumulate on
    `xray.records`."""
    import functools

    target = sink if sink is not None else xray.records

    def summarize(x):
        try:
            arr = np.asarray(x)
            if arr.dtype == object:
                raise TypeError
            return {"shape": list(arr.shape), "dtype": str(arr.dtype),
                    "crc": zlib.crc32(arr.tobytes())}
        except Exception:
            return repr(x)[:200]

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            out = fn(*args, **kwargs)
            target.append({
                "scope": name,
                "inputs": [jax.tree.map(summarize, a) for a in args],
                "outputs": jax.tree.map(summarize, out),
            })
            return out

        return wrapper

    return deco


xray.records = []
