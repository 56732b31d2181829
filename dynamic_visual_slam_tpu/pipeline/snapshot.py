"""Map / pose snapshotting — checkpoint & resume.

The reference keeps the whole map in process memory and loses it on exit
(backend.cpp:619-621; SURVEY.md §5 'Checkpoint / resume: none').  Because the
rebuild's entire state is two fixed-shape pytrees (TrackerState, MapState),
checkpointing is a flat npz dump — resumable mid-sequence, exact.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynamic_visual_slam_tpu.backend import mapping
from dynamic_visual_slam_tpu.config import SLAMConfig
from dynamic_visual_slam_tpu.frontend import tracker


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):
        for name in tree._fields:
            _flatten(getattr(tree, name), f"{prefix}/{name}", out)
    else:
        arr = np.asarray(tree)
        if arr.dtype == jnp.bfloat16:
            arr = arr.astype(np.float32)
        out[prefix] = arr


def save(path: str, tracker_state: tracker.TrackerState,
         map_state: mapping.MapState, config: SLAMConfig) -> None:
    flat: Dict[str, np.ndarray] = {}
    # the rng key needs explicit serialization
    ts = tracker_state._replace(rng=jax.random.key_data(tracker_state.rng))
    _flatten(ts, "tracker", flat)
    _flatten(map_state, "map", flat)
    flat["__config__"] = np.frombuffer(
        config.to_json().encode(), dtype=np.uint8)
    np.savez_compressed(path, **flat)


def _rebuild(cls, prefix: str, data, template) -> Any:
    vals = []
    for name in cls._fields:
        key = f"{prefix}/{name}"
        tmpl = getattr(template, name)
        if not (isinstance(tmpl, tuple) and hasattr(tmpl, "_fields")) \
                and key not in data:
            vals.append(tmpl)   # field added after the snapshot was written
            continue
        if isinstance(tmpl, tuple) and hasattr(tmpl, "_fields"):
            vals.append(_rebuild(type(tmpl), key, data, tmpl))
        else:
            arr = jnp.asarray(data[key])
            vals.append(arr.astype(tmpl.dtype) if hasattr(tmpl, "dtype")
                        else arr)
    return cls(*vals)


def load(path: str) -> Tuple[tracker.TrackerState, mapping.MapState,
                             SLAMConfig]:
    data = np.load(path)
    config = SLAMConfig.from_json(bytes(data["__config__"]).decode())
    t_tmpl = tracker.init_state(config)
    m_tmpl = mapping.init_map(config)
    ts = _rebuild(tracker.TrackerState, "tracker", data,
                  t_tmpl._replace(rng=jax.random.key_data(t_tmpl.rng)))
    ts = ts._replace(rng=jax.random.wrap_key_data(
        jnp.asarray(data["tracker/rng"], jnp.uint32)))
    ms = _rebuild(mapping.MapState, "map", data, m_tmpl)
    # Fields added after a snapshot was written backfill from the zero
    # template (see _rebuild); two of them are NOT safe as zeros and need
    # semantic defaults:
    if "map/landmarks/desc_anchor" not in data:
        # zero anchors would win min-Hamming association for low-popcount
        # descriptors; the newest descriptor is the correct stand-in (it
        # was the ONLY stored descriptor when the snapshot was written)
        ms = ms._replace(landmarks=ms.landmarks._replace(
            desc_anchor=ms.landmarks.desc_bits))
    if "tracker/kf_xyz_w" not in data:
        # no anchor points were stored: drop the last-keyframe arm so the
        # next frame re-keyframes (one extra keyframe) instead of running
        # keyframe-anchored PnP against all-zero world points
        ts = ts._replace(has_kf=jnp.asarray(False))
    return ts, ms, config
