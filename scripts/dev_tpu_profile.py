"""TPU profiling: time the chunked tracking step under component ablations
to find where the per-frame milliseconds go."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from mobile_slam_tpu.engine import chunked, estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)

R_IC = np.eye(3)


def bench_cfg(max_features=384, num_iterations=8):
    cam = CameraConfig(model_type="PINHOLE", width=512, height=512,
                       focal_length=191.0, fx=191.0, fy=191.0,
                       cx=256.0, cy=256.0)
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=150, max_points=192),
        estimator=EstimatorConfig(
            max_features=max_features, max_imu_per_interval=16,
            num_iterations=num_iterations,
        ),
    )


def time_chunk(cfg, label, chunk_len=32, reps=6, body="full"):
    params = est.make_params(cfg, jnp.float32)
    # Scale the example state generator onto this config.
    state, inp = make_example_state(cfg, params, jnp.float32)
    inputs = chunked.stack_frame_inputs([inp] * chunk_len)

    if body == "full":
        step = chunked.make_chunked_step(params, cfg.estimator.num_iterations)
    elif body == "nomarg":
        from mobile_slam_tpu.factors import marginalization as marg

        def one(state2, inp2):
            state2, is_kf = est.bookkeeping_step(state2, inp2, params)
            # solve but skip the marginalization cond by forcing new-frame
            # path with an empty prior
            from mobile_slam_tpu.solver import lm
            from mobile_slam_tpu.frontend import feature_table as ft
            w = state2.window
            table = ft.triangulate(state2.table, w.p, w.q, params.ex_t,
                                   params.ex_q, params.init_depth)
            sp = est.solver_params(params)
            w, table, res, _ = lm.optimize(w, table, state2.prior,
                                           params.ex_t, params.ex_q, sp,
                                           cfg.estimator.num_iterations)
            w2 = est._slide_window_old(w, state2.prev_acc, state2.prev_gyr)
            t2 = ft.slide_old(table, True, jnp.eye(3), jnp.zeros(3),
                              jnp.eye(3), jnp.zeros(3), params.init_depth)
            return state2._replace(window=w2, table=t2), (w.p[-1],)

        step = jax.jit(lambda s, i: jax.lax.scan(one, s, i))
    elif body == "bookonly":
        def one(state2, inp2):
            state2, is_kf = est.bookkeeping_step(state2, inp2, params)
            return state2, (state2.window.p[-1],)

        step = jax.jit(lambda s, i: jax.lax.scan(one, s, i))

    out = step(state, inputs)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(state, inputs)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    ms = 1e3 * min(times) / chunk_len
    print(f"{label:40s} {ms:7.2f} ms/frame  ({1e3/ms:6.1f} fps)")
    return ms


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    time_chunk(bench_cfg(384, 8), "full F=384 iters=8")
    time_chunk(bench_cfg(384, 8), "book-only (preint+features)",
               body="bookonly")
    time_chunk(bench_cfg(384, 8), "no-marginalization", body="nomarg")
    time_chunk(bench_cfg(384, 4), "full F=384 iters=4")
    time_chunk(bench_cfg(384, 2), "full F=384 iters=2")
    time_chunk(bench_cfg(256, 8), "full F=256 iters=8")
    time_chunk(bench_cfg(192, 8), "full F=192 iters=8")
