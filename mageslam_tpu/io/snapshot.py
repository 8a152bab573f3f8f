"""Session snapshots: the whole SLAM state to/from one .npz file.

The reference can only checkpoint terminally (Fossilize) and serialize map
snapshots piecemeal via cereal member lists (SURVEY §5.4). Here the entire
device state — MapState, TrackingHistory, PoseHistory, BowIndex, host
counters — round-trips through numpy, enabling true mid-run checkpoint/resume
(everything is a pytree of arrays; no pointer graphs to walk).
"""

from __future__ import annotations

import json

import numpy as np
import jax

from ..geometry.se3 import Pose


def _flatten(prefix: str, tree) -> dict:
    out = {}
    leaves, treedef = jax.tree.flatten(tree)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}{i}"] = np.asarray(leaf)
    return out


def _unflatten(prefix: str, data, template):
    leaves, treedef = jax.tree.flatten(template)
    new = [jax.numpy.asarray(data[f"{prefix}{i}"]) for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new)


def save_session_snapshot(path: str, session) -> None:
    """Persist a runtime.SlamSession's full state."""
    arrays = {}
    arrays.update(_flatten("map", session.map))
    arrays.update(_flatten("hist", session.history))
    arrays.update(_flatten("ph", session.pose_history))
    arrays.update(_flatten("bow", session.bow))
    arrays.update(_flatten("key", session.key))
    meta = dict(
        initialized=session.initialized,
        lost_count=session.lost_count,
        frames_since_keyframe=session.frames_since_keyframe,
        frames_since_reloc=session.frames_since_reloc,
        map_scale=session.map_scale,
        last_kf_slot=session.last_kf_slot,
        width=session.width,
        height=session.height,
    )
    arrays["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_session_snapshot(path: str, session) -> None:
    """Restore state saved by save_session_snapshot into a compatible session
    (same settings/budgets)."""
    data = np.load(path)
    session.map = _unflatten("map", data, session.map)
    session.history = _unflatten("hist", data, session.history)
    session.pose_history = _unflatten("ph", data, session.pose_history)
    session.bow = _unflatten("bow", data, session.bow)
    session.key = jax.numpy.asarray(data["key0"]) if "key0" in data else session.key
    meta = json.loads(bytes(data["meta_json"]).decode())
    session.initialized = bool(meta["initialized"])
    session.lost_count = int(meta["lost_count"])
    session.frames_since_keyframe = int(meta["frames_since_keyframe"])
    session.frames_since_reloc = int(meta["frames_since_reloc"])
    session.map_scale = float(meta["map_scale"])
    session.last_kf_slot = int(meta["last_kf_slot"])
