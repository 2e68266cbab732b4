"""Multi-sequence data parallelism over a TPU mesh.

The reference is a single-process, single-sequence estimator (SURVEY §2.8);
the TPU-native scaling axis is running many independent VIO sequences as one
SPMD program: the estimator state is a pytree of fixed-shape arrays, so a
fleet of sequences is a leading batch dimension, sharded across devices with
`jax.sharding` — per-sequence state is independent, so the hot path has no
collectives; fleet-wide metrics reduce with `psum`-style reductions at the
end (BASELINE.json configs[4], "batched multi-sequence vmapped VIO").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mobile_slam_tpu.engine import estimator as est


def make_mesh(devices=None, axis: str = "seq") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), (axis,))


def batch_states(states: list[est.EstimatorState]) -> est.EstimatorState:
    """Stack per-sequence estimator states along a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def shard_batched(tree, mesh: Mesh, axis: str = "seq"):
    """Place a batched pytree with its leading axis sharded over the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree.map(put, tree)


def make_batched_step(params: est.StaticParams, num_iterations: int,
                      mesh: Mesh | None = None, axis: str = "seq"):
    """Jitted fleet step: vmapped (bookkeeping + solve + slide) over the
    sequence axis, compiled with batch-sharded in/out so XLA partitions the
    fleet across devices (pure DP over ICI — no hot-path collectives).

    Returns fn(batched_state, batched_FrameInput) ->
    (batched_state, (p (B,3), q (B,4), ok (B,)))."""

    def one(state, inp):
        state, is_kf = est.bookkeeping_step(state, inp, params)
        state, p, q, diag = est.solve_and_slide(
            state, is_kf, params, num_iterations
        )
        ok = (diag.state_finite & (diag.vel_norm <= 10.0)
              & (diag.pos_norm <= 100.0))
        return state, (p, q, ok)

    stepped = jax.vmap(one)
    if mesh is None:
        return jax.jit(stepped)
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(stepped,
                   in_shardings=(shard, shard),
                   out_shardings=(shard, shard))


def make_batched_chunked_step(params: est.StaticParams, num_iterations: int,
                              mesh: Mesh | None = None, axis: str = "seq"):
    """Fleet feature-path serving: lax.scan over a T-frame chunk of the
    vmapped (bookkeeping + solve + slide) step — B sequences advance one
    frame per scan step in a single program. The solver's small dense ops
    (165-dim Schur/Cholesky, 11-frame window math) are latency-bound on
    TPU, so widening them B-fold is nearly free: aggregate fps scales
    ~linearly with B until the MXU saturates.

    Returns a jitted fn(batched_state, FrameInput with leading (T, B)) ->
    (batched_state, (p (T,B,3), q (T,B,4), ok (T,B), is_kf (T,B)))."""

    def one(state, inp):
        state, is_kf = est.bookkeeping_step(state, inp, params)
        state, p, q, diag = est.solve_and_slide(
            state, is_kf, params, num_iterations
        )
        ok = (diag.state_finite & (diag.vel_norm <= 10.0)
              & (diag.pos_norm <= 100.0))
        return state, (p, q, ok, diag.is_keyframe)

    vone = jax.vmap(one)

    def chunk(state, inputs):
        return jax.lax.scan(vone, state, inputs)

    if mesh is None:
        return jax.jit(chunk, donate_argnums=(0,))
    shard_b = NamedSharding(mesh, P(axis))
    shard_tb = NamedSharding(mesh, P(None, axis))
    return jax.jit(chunk, in_shardings=(shard_b, shard_tb),
                   out_shardings=(shard_b, shard_tb), donate_argnums=(0,))


def make_batched_image_step(params: est.StaticParams, num_iterations: int,
                            tracker_cfg, camera, focal: float,
                            mesh: Mesh | None = None, axis: str = "seq"):
    """Fleet FULL-image-path step: lax.scan over a T-frame chunk of the
    vmapped per-frame image step (CLAHE -> pyramid -> LK -> RANSAC ->
    Shi-Tomasi -> solve, engine/chunked.make_image_frame_step) — B
    independent camera streams' complete pipelines in one device program.

    A single 512x512 stream underutilizes the chip (small matmuls, short
    vector ops); batching sequences is the TPU-native way to convert spare
    silicon into aggregate throughput (SURVEY §2.8: scaling "sequence
    length" = scaling concurrent sequences). With a mesh, the batch axis
    shards across devices — pure DP over ICI, no hot-path collectives.

    Returns a jitted fn(carry_B, inputs_TB) -> (carry_B, outs (T, B, ...))
    where carry_B is an ImageChunkCarry with leading B on every leaf and
    inputs_TB an ImageFrameInput with leading (T, B)."""
    from mobile_slam_tpu.engine import chunked

    from mobile_slam_tpu.frontend import tracker as trk

    one_frame = chunked.make_image_frame_step(
        params, num_iterations, tracker_cfg, camera, focal)
    vone = jax.vmap(one_frame)

    def chunk(carry, inputs):
        # Batched state-independent preprocessing over (T, B) frames —
        # same trick as the single-stream chunked scan (chunked.py).
        pre = jax.vmap(jax.vmap(
            lambda im_: trk.preprocess_frame(im_, tracker_cfg)))(inputs.img)
        return jax.lax.scan(vone, carry, (inputs, pre))

    if mesh is None:
        return jax.jit(chunk, donate_argnums=(0,))
    shard_b = NamedSharding(mesh, P(axis))
    shard_tb = NamedSharding(mesh, P(None, axis))
    return jax.jit(
        chunk,
        in_shardings=(shard_b, shard_tb),
        out_shardings=(shard_b, shard_tb),
        donate_argnums=(0,),
    )


def fleet_metrics(batched_p: jax.Array, gt_p: jax.Array) -> jax.Array:
    """Example fleet-wide reduction (mean position error across the sharded
    batch) — the cross-sequence psum/mean the SURVEY calls out as the only
    hot-path-adjacent collective."""
    err = jnp.linalg.norm(batched_p - gt_p, axis=-1)
    return jnp.mean(err)
