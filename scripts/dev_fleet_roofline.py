"""Fleet-mode image-path roofline probe (VERDICT r3 weak #4).

BENCH_r03 showed fleet4 aggregate = 0.87x the single-sequence image path —
vmapping 4 streams LOSES throughput — while the README claimed
"compute-bound, no idle silicon" with no utilization evidence. This probe
compiles the single and fleet-B chunked image steps, pulls XLA's own cost
model (flops / bytes accessed / optimal_seconds) from the compiled
executables, times them on the chip, and prints the roofline comparison:

  * work ratio (fleet flops / single flops, should be ~B)
  * time ratio (fleet step time / single step time)
  * achieved FLOP/s + bytes/s and % of XLA's optimal_seconds for each

If time-ratio ~= work-ratio the chip is already saturated by one stream
(fleet can't win, but shouldn't lose); time-ratio > work-ratio localizes a
vmap-induced slowdown (e.g. batched while_loop convergence coupling).

Usage: python scripts/dev_fleet_roofline.py [--B 4] [--reps 8] [--json out]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")

from mobile_slam_tpu.engine import chunked, estimator as est
from mobile_slam_tpu.engine.example import make_example_state
from mobile_slam_tpu.parallel import batch as pbatch


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0)),
                "optimal_s": float(c.get("optimal_seconds", 0.0))}
    except Exception as exc:  # pragma: no cover
        print(f"cost_analysis unavailable: {exc}", file=sys.stderr)
        return {"flops": 0.0, "bytes": 0.0, "optimal_s": 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from bench import make_cfg  # reuse the bench's production-shape config

    cfg = make_cfg()
    params = est.make_params(cfg, jnp.float32)
    from mobile_slam_tpu.models.cameras.base import make_camera

    camera = make_camera(cfg.camera, dtype=jnp.float32)

    state, _ = make_example_state(cfg, params, jnp.float32)
    rs = np.random.RandomState(0)

    def frame_inp(k):
        m_pad = cfg.estimator.max_imu_per_interval
        return chunked.ImageFrameInput(
            img=jnp.asarray(rs.rand(cfg.camera.height, cfg.camera.width)
                            * 255.0, jnp.float32),
            ts=jnp.asarray(0.05 * (k + 1), jnp.float32),
            imu_dt=jnp.full((m_pad,), 0.005, jnp.float32),
            imu_acc=jnp.asarray(rs.randn(m_pad, 3) * 0.1 + [0, 0, 9.81],
                                jnp.float32),
            imu_gyr=jnp.asarray(rs.randn(m_pad, 3) * 0.02, jnp.float32),
            imu_cnt=jnp.asarray(10, jnp.int32),
        )

    batch = chunked.stack_image_inputs([frame_inp(k)
                                        for k in range(args.chunk)])
    from mobile_slam_tpu.frontend import tracker as trk

    carry = chunked.ImageChunkCarry(
        est_state=state,
        tracker_state=trk.init_tracker_state(
            cfg.tracker, cfg.camera.height, cfg.camera.width, jnp.float32),
        banned_ids=jnp.full((cfg.estimator.max_features,), -1, jnp.int32),
        key=jax.random.PRNGKey(0),
        depth_ema=jnp.asarray(5.0, jnp.float32),
        vel_ema=jnp.asarray(0.05, jnp.float32),
    )

    results = {}

    def run(name, step, c, b):
        lowered = jax.jit(step).lower(c, b)
        compiled = lowered.compile()
        cost = _cost(compiled)
        out = compiled(c, b)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = compiled(c, b)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / args.reps
        res = dict(cost, step_s=dt,
                   flops_per_s=cost["flops"] / dt if dt else 0.0,
                   bytes_per_s=cost["bytes"] / dt if dt else 0.0,
                   pct_of_optimal=(100.0 * cost["optimal_s"] / dt)
                   if dt and cost["optimal_s"] else 0.0)
        results[name] = res
        print(f"[{name}] step={dt*1e3:.1f} ms  "
              f"flops={cost['flops']:.3e} ({res['flops_per_s']:.3e}/s)  "
              f"bytes={cost['bytes']:.3e} ({res['bytes_per_s']:.3e}/s)  "
              f"xla-optimal={cost['optimal_s']*1e3:.2f} ms "
              f"({res['pct_of_optimal']:.1f}% of roofline)")
        return res

    step1 = chunked.make_chunked_image_step(
        params, cfg.estimator.num_iterations, cfg.tracker, camera,
        cfg.camera.focal_length)
    r1 = run("single", lambda c, b: step1(c, b), carry, batch)

    B = args.B
    stepB = pbatch.make_batched_image_step(
        params, cfg.estimator.num_iterations, cfg.tracker, camera,
        cfg.camera.focal_length)
    carryB = jax.tree.map(lambda x: jnp.stack([x] * B), carry)
    batchB = jax.tree.map(lambda x: jnp.stack([x] * B, axis=1), batch)
    rB = run(f"fleet{B}", lambda c, b: stepB(c, b), carryB, batchB)

    work_ratio = rB["flops"] / max(r1["flops"], 1.0)
    time_ratio = rB["step_s"] / max(r1["step_s"], 1e-12)
    agg = B * args.chunk / rB["step_s"]
    single = args.chunk / r1["step_s"]
    print(f"\nwork ratio (flops) = {work_ratio:.2f}x   "
          f"time ratio = {time_ratio:.2f}x")
    print(f"fps single = {single:.1f}, fleet{B} aggregate = {agg:.1f} "
          f"({agg/single:.2f}x)")
    results["summary"] = {
        "B": B, "work_ratio": work_ratio, "time_ratio": time_ratio,
        "fps_single": single, "fps_fleet_aggregate": agg,
        "fleet_speedup": agg / single,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
