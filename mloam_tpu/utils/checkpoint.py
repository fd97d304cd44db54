"""Checkpoint / resume: pytree snapshots of the full SLAM state.

The reference only persists the loop pose graph and final PCD maps on
SIGINT (``pose_graph.cpp:655-770``, ``lidar_mapper_keyframe.cpp:853-919``) —
no mid-run resume. Pod jobs preempt, so this framework checkpoints the
complete pipeline state (window, mapper keyframe DB, loop graph, calibration
buffers, host counters) to a single .npz and restores it exactly.

Any NamedTuple-of-arrays pytree round-trips; nested NamedTuples are
flattened with ``/``-joined key paths.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(prefix: str, tree: Any, out: dict):
    if hasattr(tree, "_fields"):  # NamedTuple
        for name in tree._fields:
            _flatten(f"{prefix}{name}/", getattr(tree, name), out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(f"{prefix}{i}/", v, out)
    elif tree is None:
        out[prefix + "__none__"] = np.zeros(0)
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)


def _unflatten(prefix: str, template: Any, data: dict):
    if hasattr(template, "_fields"):
        vals = {
            name: _unflatten(f"{prefix}{name}/", getattr(template, name), data)
            for name in template._fields
        }
        return type(template)(**vals)
    if isinstance(template, (list, tuple)):
        seq = [
            _unflatten(f"{prefix}{i}/", v, data) for i, v in enumerate(template)
        ]
        return type(template)(seq) if isinstance(template, list) else tuple(seq)
    if template is None:
        return None
    arr = data[prefix.rstrip("/")]
    return jnp.asarray(arr)


def save_state(path: str, tree: Any, meta: dict | None = None):
    """Save a pytree (plus an optional JSON-serializable meta dict)."""
    out: dict = {}
    _flatten("", tree, out)
    if meta is not None:
        out["__meta__"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8
        )
    np.savez_compressed(path, **out)


def load_state(path: str, template: Any):
    """Restore a pytree saved by save_state. Returns (tree, meta)."""
    data = dict(np.load(path, allow_pickle=False))
    meta = None
    if "__meta__" in data:
        meta = json.loads(bytes(data.pop("__meta__")).decode())
    return _unflatten("", template, data), meta


def save_pipeline(path: str, pipe) -> None:
    """Snapshot an OdometryPipeline / FullPipeline / SlamPipeline."""
    from mloam_tpu.models.pipeline import FullPipeline, OdometryPipeline, SlamPipeline

    if isinstance(pipe, SlamPipeline):
        # snapshotting mid-pipeline: drain the one-sweep-delayed keyframe/
        # verify stages BEFORE capturing state — flush() rebinds
        # pipe.loop_state (and the counters), so capturing first would save
        # a stale loop_state whose keyframe count lags the meta counters
        pipe.flush()
        tree = (pipe.full.odom.window, pipe.full.mapper_state,
                pipe.loop_state, tuple(pipe.full.odom.calib_buffers),
                tuple(pipe.full.odom.motions), pipe.full.odom.world_pose)
        meta = {
            "kind": "slam",
            "frame_idx": pipe.full.odom.frame_idx,
            "ext_mode": pipe.full.odom.ext_mode,
            "kf_counter": pipe.kf_counter,
            "n_loops": pipe.n_loops,
            "loop_kf_count": pipe.loop_kf_count,
        }
    elif isinstance(pipe, FullPipeline):
        tree = (pipe.odom.window, pipe.mapper_state,
                tuple(pipe.odom.calib_buffers), tuple(pipe.odom.motions),
                pipe.odom.world_pose)
        meta = {"kind": "full", "frame_idx": pipe.odom.frame_idx,
                "ext_mode": pipe.odom.ext_mode}
    elif isinstance(pipe, OdometryPipeline):
        tree = (pipe.window, tuple(pipe.calib_buffers), tuple(pipe.motions),
                pipe.world_pose)
        meta = {"kind": "odom", "frame_idx": pipe.frame_idx,
                "ext_mode": pipe.ext_mode}
    else:
        raise TypeError(type(pipe))
    save_state(path, tree, meta)


def load_pipeline(path: str, pipe) -> None:
    """Restore a snapshot into a freshly-constructed pipeline (same config)."""
    from mloam_tpu.models.pipeline import FullPipeline, OdometryPipeline, SlamPipeline

    if isinstance(pipe, SlamPipeline):
        template = (pipe.full.odom.window, pipe.full.mapper_state,
                    pipe.loop_state, tuple(pipe.full.odom.calib_buffers),
                    tuple(pipe.full.odom.motions), pipe.full.odom.world_pose)
        tree, meta = load_state(path, template)
        (pipe.full.odom.window, pipe.full.mapper_state, pipe.loop_state,
         bufs, motions, pipe.full.odom.world_pose) = tree
        pipe.full.odom.calib_buffers = list(bufs)
        pipe.full.odom.motions = list(motions)
        pipe.full.odom.frame_idx = meta["frame_idx"]
        pipe.full.odom.ext_mode = meta["ext_mode"]
        pipe.kf_counter = meta["kf_counter"]
        pipe.n_loops = meta["n_loops"]
        # old snapshots predate the host count mirror: recover it from the
        # restored device state
        pipe.loop_kf_count = meta.get(
            "loop_kf_count", int(jax.device_get(pipe.loop_state.count)))
    elif isinstance(pipe, FullPipeline):
        template = (pipe.odom.window, pipe.mapper_state,
                    tuple(pipe.odom.calib_buffers), tuple(pipe.odom.motions),
                    pipe.odom.world_pose)
        tree, meta = load_state(path, template)
        (pipe.odom.window, pipe.mapper_state, bufs, motions,
         pipe.odom.world_pose) = tree
        pipe.odom.calib_buffers = list(bufs)
        pipe.odom.motions = list(motions)
        pipe.odom.frame_idx = meta["frame_idx"]
        pipe.odom.ext_mode = meta["ext_mode"]
    elif isinstance(pipe, OdometryPipeline):
        template = (pipe.window, tuple(pipe.calib_buffers),
                    tuple(pipe.motions), pipe.world_pose)
        tree, meta = load_state(path, template)
        pipe.window, bufs, motions, pipe.world_pose = tree
        pipe.calib_buffers = list(bufs)
        pipe.motions = list(motions)
        pipe.frame_idx = meta["frame_idx"]
        pipe.ext_mode = meta["ext_mode"]
    else:
        raise TypeError(type(pipe))
