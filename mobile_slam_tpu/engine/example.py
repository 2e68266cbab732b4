"""Deterministic example states for compile checks and dry runs.

Builds a small but fully-populated estimator state (window on a smooth arc,
landmark bank with multi-frame tracks, consistent preintegration buffers)
without running the simulator or the image frontend — used by
__graft_entry__ and the sharding tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig, NUM_SLOTS,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import estimator as est

W = NUM_SLOTS


def tiny_config(max_features: int = 64, max_imu: int = 8,
                max_points: int = 32, num_iterations: int = 2) -> VIOConfig:
    cam = CameraConfig(
        model_type="PINHOLE", width=64, height=64,
        focal_length=60.0, fx=60.0, fy=60.0, cx=32.0, cy=32.0,
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=24, min_dist=8, max_points=max_points,
                              lk_pyramid_levels=2),
        estimator=EstimatorConfig(
            max_features=max_features, max_imu_per_interval=max_imu,
            num_iterations=num_iterations,
        ),
    )


def production_config() -> VIOConfig:
    """The PRODUCTION tum_vi/bench shapes (bench.py make_cfg): 384 feature
    slots, 160 tracker points, 16 IMU samples/interval, 3 LM iterations —
    so the multichip dryrun partitions the same program the chip runs, not
    a toy (padding/layout choices differ with shape)."""
    cam = CameraConfig(
        model_type="KANNALA_BRANDT", width=512, height=512,
        focal_length=190.97847715128717,
        fx=190.97847715128717, fy=190.9733070521226,
        cx=254.93170605935475, cy=256.8974428996504,
        dist=(0.0034823894022493434, 0.0007150348452162257,
              -0.0020532361418706202, 0.00020293673591811182),
        r_ic=(0.0, 0.0, 1.0, -1.0, 0.0, 0.0, 0.0, -1.0, 0.0),
        t_ic=(0.045, 0.073, -0.044),
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=150, min_dist=20, max_points=160,
                              fisheye=True),
        estimator=EstimatorConfig(
            max_features=384, max_imu_per_interval=16, num_iterations=3,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
        ),
    )


def make_example_state(cfg: VIOConfig, params: est.StaticParams,
                       dtype=jnp.float32, seed: int = 0):
    """A NON_LINEAR-phase estimator state + one FrameInput, all consistent
    enough for the solver to run meaningfully."""
    rng = np.random.default_rng(seed)
    state = est.init_state(cfg, params, dtype)
    g_norm = float(cfg.estimator.g_norm)

    # Window on a small arc with constant velocity.
    dt_f = 0.05
    ts = np.arange(W) * dt_f
    p = np.stack([0.3 * ts, 0.05 * np.sin(2 * ts), 0.02 * ts], -1)
    v = np.gradient(p, ts, axis=0)
    q = np.tile([1.0, 0, 0, 0], (W, 1))

    # Landmarks ahead of the camera; tracks across all frames.
    n_feat = min(cfg.estimator.max_features, 48)
    lm = np.stack([
        rng.uniform(-1.5, 1.5, n_feat),
        rng.uniform(-1.0, 1.0, n_feat),
        rng.uniform(2.5, 6.0, n_feat),
    ], -1)

    obs = np.zeros((cfg.estimator.max_features, W, 3))
    mask = np.zeros((cfg.estimator.max_features, W), bool)
    fid = np.full(cfg.estimator.max_features, -1, np.int32)
    for f in range(n_feat):
        fid[f] = f
        for w_i in range(W):
            rel = lm[f] - p[w_i]
            obs[f, w_i] = [rel[0] / rel[2], rel[1] / rel[2], 1.0]
            mask[f, w_i] = True

    table = state.table._replace(
        fid=jnp.asarray(fid),
        start=jnp.zeros(cfg.estimator.max_features, jnp.int32),
        obs=jnp.asarray(obs, dtype),
        mask=jnp.asarray(mask),
    )

    # Consistent IMU buffers per interval: stationary-rotation free motion.
    m = cfg.estimator.max_imu_per_interval
    n_s = min(m, 5)
    a_world = np.gradient(v, ts, axis=0)
    imu_dt = np.zeros((W, m))
    imu_acc = np.zeros((W, m, 3))
    imu_gyr = np.zeros((W, m, 3))
    imu_cnt = np.zeros(W, np.int32)
    acc_meas = a_world + [0, 0, g_norm]
    for w_i in range(1, W):
        imu_dt[w_i, :n_s] = dt_f / n_s
        imu_acc[w_i, :n_s] = acc_meas[w_i]
        imu_cnt[w_i] = n_s

    window = state.window._replace(
        ts=jnp.asarray(ts, dtype),
        p=jnp.asarray(p, dtype),
        q=jnp.asarray(q, dtype),
        v=jnp.asarray(v, dtype),
        imu_dt=jnp.asarray(imu_dt, dtype),
        imu_acc=jnp.asarray(imu_acc, dtype),
        imu_gyr=jnp.asarray(imu_gyr, dtype),
        imu_cnt=jnp.asarray(imu_cnt),
        imu_acc0=jnp.asarray(acc_meas, dtype),
    )
    window = est.repropagate_window(
        window, jnp.zeros(3, dtype), jnp.zeros(3, dtype), params.noise
    )
    state = state._replace(
        window=window, table=table,
        frame_count=jnp.asarray(W - 1, jnp.int32),
        first_imu_seen=jnp.asarray(True),
        prev_acc=jnp.asarray(acc_meas[-1], dtype),
        prev_gyr=jnp.zeros(3, dtype),
    )

    # One new frame's input.
    k = cfg.tracker.max_points
    ids = np.full(k, -1, np.int32)
    obs_in = np.zeros((k, 3))
    valid = np.zeros(k, bool)
    p_new = p[-1] + v[-1] * dt_f
    for f in range(min(n_feat, k)):
        ids[f] = f
        rel = lm[f] - p_new
        obs_in[f] = [rel[0] / rel[2], rel[1] / rel[2], 1.0]
        valid[f] = True
    inp = est.FrameInput(
        ts=jnp.asarray(ts[-1] + dt_f, dtype),
        ids=jnp.asarray(ids),
        obs=jnp.asarray(obs_in, dtype),
        uv=jnp.zeros((k, 2), dtype),
        vel=jnp.zeros((k, 2), dtype),
        valid=jnp.asarray(valid),
        imu_dt=jnp.asarray(imu_dt[1], dtype),
        imu_acc=jnp.asarray(imu_acc[1], dtype),
        imu_gyr=jnp.asarray(imu_gyr[1], dtype),
        imu_cnt=jnp.asarray(int(imu_cnt[1]), jnp.int32),
    )
    return state, inp
