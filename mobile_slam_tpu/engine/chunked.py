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

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.engine.vio_engine import VIOEngine
from mobile_slam_tpu.frontend import tracker as trk

# Scale-runaway gate constants, shared with the streaming engine (see the
# rationale comment on the VIOEngine class).
_DEPTH_RUNAWAY_FACTOR = VIOEngine.DEPTH_RUNAWAY_FACTOR
_VEL_RUNAWAY_FACTOR = VIOEngine.VEL_RUNAWAY_FACTOR
_DEPTH_EMA_RATE = VIOEngine.DEPTH_EMA_RATE


def scale_gate(depth_ema: jax.Array, vel_ema: jax.Array,
               med_depth: jax.Array, vel: jax.Array):
    """Device-side scale-runaway gate: mirrors
    VIOEngine._check_scale_runaway (median solved depth AND |v| vs slow
    EMA baselines — runaway inflates both jointly, viewpoint changes only
    depth; ema == 0 encodes "uninitialized"). Returns
    (new_depth_ema, new_vel_ema, runaway)."""
    has_depth = med_depth > 0
    ema0 = jnp.where(depth_ema > 0, depth_ema, med_depth)
    vema0 = jnp.maximum(jnp.where(depth_ema > 0, vel_ema, vel), 0.05)
    runaway = (has_depth & (med_depth > _DEPTH_RUNAWAY_FACTOR * ema0)
               & (vel > _VEL_RUNAWAY_FACTOR * vema0))
    ema1 = jnp.where(has_depth,
                     ema0 + _DEPTH_EMA_RATE * (med_depth - ema0),
                     depth_ema)
    vema1 = jnp.where(has_depth,
                      vema0 + _DEPTH_EMA_RATE * (vel - vema0),
                      vel_ema)
    return ema1, vema1, runaway


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


class ImageFrameInput(NamedTuple):
    """Per-frame raw input for the full image path: grayscale frame + the
    IMU slice (prev_ts, ts] (measurement_processor.cpp:272-286)."""

    img: jax.Array      # (H, W) grayscale 0..255
    ts: jax.Array       # () seconds since sequence start
    imu_dt: jax.Array   # (M,)
    imu_acc: jax.Array  # (M, 3)
    imu_gyr: jax.Array  # (M, 3)
    imu_cnt: jax.Array  # () int32


# Compounding-runaway growth detector (in-scan). The EMA gate above needs
# med_depth to reach FACTOR x a baseline that itself chases the runaway, so
# a bad visual-inertial initialization (scale off, then compounding ~1%/
# frame) runs ~30 frames before tripping (adversarial level 1: divergence
# from frame ~16, EMA gate at frame 48). The growth detector compares
# against a GROWTH_WINDOW-frame-old snapshot instead: depth AND velocity
# jointly exceeding their laggged values by the growth factors is the
# compounding-runaway signature (a legitimate near-wall -> across-the-room
# viewpoint change moves depth but not velocity; see the EMA-gate rationale
# on VIOEngine). Rings of zeros disable the detector until seeded
# (serving._enter_chunked seeds them with the streaming EMAs).
GROWTH_WINDOW = 30
DEPTH_GROWTH_FACTOR = 1.8
VEL_GROWTH_FACTOR = 1.4
# Distinct arrays: donated jits reject the same buffer appearing twice in
# one call, and jnp.asarray can alias identical host constants.
_ZERO_RING_D = np.zeros(GROWTH_WINDOW, np.float32)
_ZERO_RING_V = np.zeros(GROWTH_WINDOW, np.float32)


def growth_gate(lag_depth: jax.Array, lag_vel: jax.Array, lag_i: jax.Array,
                med_depth: jax.Array, vel: jax.Array):
    """Lagged-ratio runaway detector. Returns (new_lag_depth, new_lag_vel,
    new_lag_i, growth). The slot at lag_i holds the GROWTH_WINDOW-frame-old
    sample (the ring is written after reading)."""
    lagd = lag_depth[lag_i]
    lagv = lag_vel[lag_i]
    # The velocity criterion requires the lagged baseline ITSELF to be
    # moving (lagv > floor), not a floored ratio: with max(lagv, floor) a
    # legitimate acceleration from near-hover (lagv ~ 0.02) toward open
    # space (depth 1.8x) trips on any vel > 1.4*floor = 0.07 m/s and can
    # hold for a full lag window, forcing an unnecessary rebuild of a
    # healthy state. A compounding runaway inflates lagv past the floor
    # within one window, so detection is only delayed, never lost (the EMA
    # scale gate covers the window in between).
    growth = ((lagd > 0) & (med_depth > DEPTH_GROWTH_FACTOR * lagd)
              & (lagv > 0.05) & (vel > VEL_GROWTH_FACTOR * lagv))
    new_lag_depth = lag_depth.at[lag_i].set(
        jnp.where(med_depth > 0, med_depth, lagd))
    new_lag_vel = lag_vel.at[lag_i].set(vel)
    new_lag_i = (lag_i + 1) % GROWTH_WINDOW
    return new_lag_depth, new_lag_vel, new_lag_i, growth


class ImageChunkCarry(NamedTuple):
    est_state: est.EstimatorState
    tracker_state: trk.TrackerState
    banned_ids: jax.Array   # (F,) estimator outlier feedback to the tracker
    key: jax.Array          # PRNG key for RANSAC hypothesis sampling
    depth_ema: jax.Array    # () slow median-depth baseline; 0 = uninitialized
    vel_ema: jax.Array      # () slow |v| baseline for the runaway gate
    # Growth-detector rings (defaults keep older positional constructors
    # working; all-zero rings = detector off until it self-fills).
    lag_depth: jax.Array = _ZERO_RING_D   # (GROWTH_WINDOW,)
    lag_vel: jax.Array = _ZERO_RING_V     # (GROWTH_WINDOW,)
    lag_i: jax.Array = np.int32(0)        # () ring cursor


def make_image_frame_step(params: est.StaticParams, num_iterations: int,
                          tracker_cfg, camera, focal: float):
    """The full per-frame image-path step: CLAHE -> pyramid -> LK
    (+FB/anchor) -> F-RANSAC -> Shi-Tomasi -> undistort
    (frontend/tracker.py) and then bookkeeping + solve + slide — the
    reference's complete per-frame hot loop (vio_engine.cpp:209-243).

    Returns fn(ImageChunkCarry, ImageFrameInput) ->
    (carry, (p (3,), q (4,), ok (), is_kf ())), suitable for lax.scan
    (make_chunked_image_step) or vmap (parallel.batch fleet mode)."""

    def one_frame(carry: ImageChunkCarry, scan_x):
        inp, pre = scan_x
        key, sub = jax.random.split(carry.key)
        tstate, tout = trk.detect_and_track(
            carry.tracker_state, inp.img, inp.ts, camera, tracker_cfg,
            sub, focal, banned_ids=carry.banned_ids, preprocessed=pre,
        )
        finp = est.FrameInput(
            ts=inp.ts, ids=tout.ids, obs=tout.obs, uv=tout.uv,
            vel=tout.vel, valid=tout.valid,
            imu_dt=inp.imu_dt, imu_acc=inp.imu_acc, imu_gyr=inp.imu_gyr,
            imu_cnt=inp.imu_cnt,
        )
        state, is_kf = est.bookkeeping_step(carry.est_state, finp, params)
        state, p, q, diag = est.solve_and_slide(
            state, is_kf, params, num_iterations
        )
        # Chunked mode has no host gates, so the scale-runaway check runs
        # on device inside the scan.
        ema1, vema1, runaway = scale_gate(carry.depth_ema, carry.vel_ema,
                                          diag.med_depth, diag.vel_norm)
        lagd, lagv, lagi, growth = growth_gate(
            carry.lag_depth, carry.lag_vel, carry.lag_i,
            diag.med_depth, diag.vel_norm)
        ok = (diag.state_finite & (diag.vel_norm <= 10.0)
              & (diag.pos_norm <= 100.0) & ~runaway & ~growth)
        return (ImageChunkCarry(state, tstate, diag.culled_ids, key,
                                ema1, vema1, lagd, lagv, lagi),
                (p, q, ok, diag.is_keyframe))

    return one_frame


def make_chunked_image_step(params: est.StaticParams, num_iterations: int,
                            tracker_cfg, camera, focal: float):
    """Full image path in ONE device program per chunk: a lax.scan of
    make_image_frame_step over a T-frame chunk, with zero host round trips
    inside the chunk.

    Returns a jitted fn(ImageChunkCarry, ImageFrameInput-with-leading-T) ->
    (carry, (p (T,3), q (T,4), ok (T,), is_kf (T,)))."""
    one_frame = make_image_frame_step(params, num_iterations, tracker_cfg,
                                      camera, focal)

    def chunk(carry, inputs):
        # State-independent image work (CLAHE/pyramid/corner response) is
        # batched across the whole chunk OUTSIDE the sequential scan:
        # batched image ops utilize the chip far better than the same ops
        # issued one frame at a time inside the scan, and XLA can overlap
        # this block with nothing serial ahead of it.
        pre = jax.vmap(lambda im_: trk.preprocess_frame(im_, tracker_cfg))(
            inputs.img)
        return jax.lax.scan(one_frame, carry, (inputs, pre))

    return jax.jit(chunk, donate_argnums=(0,))


def stack_image_inputs(inputs: list[ImageFrameInput]) -> ImageFrameInput:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *inputs)
