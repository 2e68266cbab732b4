"""Fused-cost breakdown of detect_and_track by stage ablation.

Standalone per-stage timings carry a ~1.2 ms dispatch floor each, so the
only honest attribution is differential: time the FUSED tracker program
with individual stages disabled and report the deltas. Run on the chip.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_dnt_breakdown.py
"""

import dataclasses
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.frontend import tracker as trk  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.ops import ransac as ransac_mod  # noqa: E402

REPS = int(next((a.split("=")[1] for a in sys.argv
                 if a.startswith("--reps=")), 30))


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.block_until_ready(out)
        trials.append((time.perf_counter() - t0) / REPS)
    ms = 1e3 * min(trials)
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def main():
    cfg = bench.make_cfg()
    cam64 = make_camera(cfg.camera, dtype=jnp.float64)
    scfg = sim.SimConfig(
        duration=8.0, cam_rate=20.0, imu_rate=200.0, num_landmarks=900,
        max_features=150, acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
        seed=7,
    )
    data = sim.simulate(scfg, cam64, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    engine = VIOEngine(cfg, jnp.float32)
    imu_i = 0
    frames = []
    for fi, ts in enumerate(data.cam_ts):
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        frame = sim.render_frame(data, fi, cam64, cfg.camera.r_ic_mat,
                                 cfg.camera.t_ic_vec)
        frames.append(frame)
        res = engine.process_frame(frame, ts)
        if res.status == Status.TRACKING and fi >= 16:
            break
    print(f"device={jax.devices()[0]} warm at frame {fi}", file=sys.stderr)

    dtype = jnp.float32
    img = jax.device_put(jnp.asarray(frames[-1], dtype))
    ts_dev = jnp.asarray(0.05, dtype)
    tstate = engine.tracker_state
    camera = engine.camera
    key = jax.random.PRNGKey(0)
    focal = cfg.camera.focal_length

    pre_fn = jax.jit(lambda x: trk.preprocess_frame(x, cfg.tracker))
    pre = pre_fn(img)
    jax.block_until_ready(pre[0])

    def make_fn(tcfg, use_pre=True, force_ransac=None):
        if force_ransac is not None:
            # Monkeypatch level: gate the RANSAC cond by a constant.
            orig = trk.detect_and_track

        def fn(st, x, t, k):
            return trk.detect_and_track(
                st, x, t, camera, tcfg, k, focal,
                preprocessed=(pre if use_pre else None))
        return jax.jit(fn)

    base = cfg.tracker
    t_pre = timed("preprocess_frame (clahe+pyr+response)", pre_fn, img)
    t_full = timed("detect_and_track (inline preprocess)",
                   make_fn(base, use_pre=False), tstate, img, ts_dev, key)
    t_wpre = timed("detect_and_track (pre supplied)",
                   make_fn(base, use_pre=True), tstate, img, ts_dev, key)
    t_nofb = timed("  - fb_check off",
                   make_fn(dataclasses.replace(base, fb_check=False)),
                   tstate, img, ts_dev, key)
    t_noanc = timed("  - anchor_refine off",
                    make_fn(dataclasses.replace(base, anchor_refine=False)),
                    tstate, img, ts_dev, key)
    t_noransac = timed("  - ransac_iters=1 (near-free hypotheses)",
                       make_fn(dataclasses.replace(base, ransac_iters=1)),
                       tstate, img, ts_dev, key)
    t_norefill = timed("  - refill gated off (deficit=K)",
                       make_fn(dataclasses.replace(
                           base, refill_min_deficit=10 ** 6)),
                       tstate, img, ts_dev, key)
    t_min = timed("  - all of the above off",
                  make_fn(dataclasses.replace(
                      base, fb_check=False, anchor_refine=False,
                      ransac_iters=1, refill_min_deficit=10 ** 6)),
                  tstate, img, ts_dev, key)

    print("\n--- differential attribution (pre supplied) ---")
    print(f"preprocess (batched outside scan)      {t_full - t_wpre:8.3f} ms")
    print(f"fb (backward LK)                       {t_wpre - t_nofb:8.3f} ms")
    print(f"anchor refine + extract                {t_wpre - t_noanc:8.3f} ms")
    print(f"ransac (64 -> 1 hypotheses)            {t_wpre - t_noransac:8.3f} ms")
    print(f"shi-tomasi refill block                {t_wpre - t_norefill:8.3f} ms")
    print(f"residual core (LK fwd + undistort + bookkeeping) "
          f"{t_min:8.3f} ms")


if __name__ == "__main__":
    main()
