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
               tracker_state: trk.TrackerState | None = None) -> None:
    blobs, _ = _flatten_with_paths(state)
    payload = {f"est:{k}": v for k, v in blobs.items()}
    if tracker_state is not None:
        tblobs, _ = _flatten_with_paths(tracker_state)
        payload.update({f"trk:{k}": v for k, v in tblobs.items()})
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
