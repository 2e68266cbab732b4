"""Chunked frame processing — the high-throughput serving mode.

The reference pipelines frames one at a time through threads
(vio_system.cpp:35-57); on TPU the equivalent latency-hiding tool is
batching dispatches: a `lax.scan` over a chunk of frames runs the entire
frontend+filter for T frames in ONE device program, amortizing host-device
round trips (essential when the chip sits behind a network tunnel) and
letting XLA overlap transfers with compute.

Used by bench.py and available through VIOEngine for offline/burst replay.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mobile_slam_tpu.engine import estimator as est


def make_chunked_step(params: est.StaticParams, num_iterations: int):
    """Returns a jitted fn(state, FrameInput-with-leading-T) ->
    (state, (p (T,3), q (T,4), ok (T,), is_kf (T,))).

    NON_LINEAR phase only: every frame runs bookkeeping + solve + slide
    (processIMU + processImage, estimator.cpp:107-257)."""

    def one_frame(state, inp):
        state, is_kf = est.bookkeeping_step(state, inp, params)
        state, p, q, diag = est.solve_and_slide(
            state, is_kf, params, num_iterations
        )
        ok = (diag.state_finite & (diag.vel_norm <= 10.0)
              & (diag.pos_norm <= 100.0))
        return state, (p, q, ok, diag.is_keyframe)

    def chunk(state, inputs):
        return jax.lax.scan(one_frame, state, inputs)

    # Donating the carried state avoids a full state copy per chunk call.
    return jax.jit(chunk, donate_argnums=(0,))


def stack_frame_inputs(inputs: list[est.FrameInput]) -> est.FrameInput:
    """Stack host-built FrameInputs along a leading chunk axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *inputs)
