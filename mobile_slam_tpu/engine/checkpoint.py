"""Estimator checkpoint/resume.

The reference has no engine-state checkpointing (SURVEY §5: a reset restarts
initialization; the only artifacts are trajectory flushes). Because the
whole TPU estimator state is a fixed-shape pytree, full checkpointing is
nearly free here: save/restore the EstimatorState + tracker state to a
single .npz, making long sessions resumable and enabling bit-exact replay
debugging.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.frontend import tracker as trk


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for path, leaf in flat:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out, treedef


def save_state(path: str, state: est.EstimatorState,
               tracker_state: trk.TrackerState | None = None,
               extra: dict | None = None) -> None:
    """``extra`` holds engine host-side arrays/scalars (prefixed ``x:``)
    needed for a full resumable engine snapshot (save_engine)."""
    blobs, _ = _flatten_with_paths(state)
    payload = {f"est:{k}": v for k, v in blobs.items()}
    if tracker_state is not None:
        tblobs, _ = _flatten_with_paths(tracker_state)
        payload.update({f"trk:{k}": v for k, v in tblobs.items()})
    for k, v in (extra or {}).items():
        payload[f"x:{k}"] = np.asarray(v)
    np.savez_compressed(path, **payload)


def load_state(path: str, template: est.EstimatorState,
               tracker_template: trk.TrackerState | None = None):
    """Restore states saved by save_state. Templates provide the pytree
    structure (shapes must match the saved config)."""
    data = np.load(path)

    def fill(tree, prefix):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path_, leaf in flat:
            key = prefix + "/".join(str(p) for p in path_)
            arr = jnp.asarray(data[key], dtype=leaf.dtype)
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"checkpoint shape mismatch at {key}: "
                    f"{arr.shape} vs {leaf.shape}")
            leaves.append(arr)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    state = fill(template, "est:")
    if tracker_template is not None:
        return state, fill(tracker_template, "trk:")
    return state


def load_extra(path: str) -> dict:
    """The ``extra`` dict saved by save_state (``x:``-prefixed entries)."""
    data = np.load(path)
    return {k[2:]: data[k] for k in data.files if k.startswith("x:")}


# ---------------------------------------------------------------------------
# Full engine snapshot (CLI --checkpoint / --resume; serving hook)
# ---------------------------------------------------------------------------

def save_engine(path: str, engine) -> None:
    """Snapshot a TRACKING VIOEngine into one .npz: estimator + tracker
    pytrees plus the host-side fields a bit-exact resume needs (PRNG key,
    EMAs, pending IMU queue, timestamps). Beyond the reference (SURVEY §5:
    it has none); restores with load_engine into a fresh engine built from
    the SAME config."""
    import json

    host = {
        "t0": engine._t0,
        "first_frame_time": engine._first_frame_time,
        "last_frame_ts": engine._last_frame_ts,
        "status": int(engine.status.value),
        "frame_index": int(engine.frame_index),
        "consecutive_failures": int(engine._consecutive_failures),
        "cooldown_remaining": int(engine._cooldown_remaining),
        "depth_ema": engine._depth_ema,
        "vel_ema": engine._vel_ema,
    }
    pblobs, _ = _flatten_with_paths(engine.params)
    extra = {
        "host_json": np.frombuffer(
            json.dumps(host).encode(), dtype=np.uint8),
        # StaticParams are runtime-mutable device scalars (gravity is
        # refined by initialization; setTrackingParams analogs retune the
        # rest) — a resume with the config defaults diverges immediately.
        **{f"par/{k}": v for k, v in pblobs.items()},
        "gravity_np": np.asarray(engine._gravity_np),
        "window_ts": np.asarray(engine.window_ts),
        "banned_ids": np.asarray(engine._banned_ids),
        "key": np.asarray(engine._key),
        "pending_imu": (np.stack(engine._pending_imu)
                        if engine._pending_imu else np.zeros((0, 7))),
        "last_imu": (engine._last_imu if engine._last_imu is not None
                     else np.full(7, np.nan)),
        "last_imu_tail": np.asarray(engine._last_imu_tail),
        "last_pose": (engine._last_pose if engine._last_pose is not None
                      else np.full((4, 4), np.nan)),
    }
    save_state(path, engine.state, engine.tracker_state, extra=extra)


def load_engine(path: str, engine) -> None:
    """Restore a save_engine snapshot into ``engine`` (fresh, same config).
    After this the engine continues the sequence exactly where the saved
    one stopped (bit-exact given the same inputs and backend)."""
    import json

    from mobile_slam_tpu.engine.vio_engine import Status

    engine.state, engine.tracker_state = load_state(
        path, engine.state, engine.tracker_state)
    x = load_extra(path)
    host = json.loads(bytes(x["host_json"]).decode())
    pflat, ptreedef = jax.tree_util.tree_flatten_with_path(engine.params)
    engine.params = jax.tree_util.tree_unflatten(
        ptreedef,
        [jnp.asarray(x["par/" + "/".join(str(p) for p in path_)],
                     dtype=leaf.dtype)
         for path_, leaf in pflat])
    engine._gravity_np = np.asarray(x["gravity_np"])
    engine._t0 = host["t0"]
    engine._first_frame_time = host["first_frame_time"]
    engine._last_frame_ts = host["last_frame_ts"]
    engine.status = Status(host["status"])
    engine.frame_index = host["frame_index"]
    engine._consecutive_failures = host["consecutive_failures"]
    engine._cooldown_remaining = host["cooldown_remaining"]
    engine._depth_ema = host["depth_ema"]
    engine._vel_ema = host["vel_ema"]
    engine.window_ts = np.asarray(x["window_ts"])
    engine._banned_ids = jnp.asarray(x["banned_ids"])
    engine._key = jnp.asarray(x["key"])
    engine._pending_imu = [s for s in np.asarray(x["pending_imu"])]
    li = np.asarray(x["last_imu"])
    engine._last_imu = None if np.isnan(li).all() else li
    engine._last_imu_tail = np.asarray(x["last_imu_tail"])
    lp = np.asarray(x["last_pose"])
    engine._last_pose = None if np.isnan(lp).all() else lp
