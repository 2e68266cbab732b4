"""Feature-level multiseed A/B (CPU-friendly) — marginalization arms.

The image-path harness (dev_multiseed.py) needs the chip (rendered frames
through Pallas kernels); this variant drives the same estimator through the
FEATURE path (process_features + chunked scan, bench.py phases 1-2), which
runs in minutes on CPU in float32 — the production dtype — so prior-
factorization arms can be compared E2E without TPU access. The visual
noise here is iid pixel noise (see ROUND2_NOTES "scale observability":
structured anchor-locked noise on the image path is the harder case), so
treat results as a lower bound on separation between arms.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_multiseed_features.py \
      [--seeds=8] [--duration=14] [--arms=dense,sqrtfull] [--cpu] \
      [--out=/tmp/multiseed_feat.json]
"""

import json
import os
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from mobile_slam_tpu.engine import chunked  # noqa: E402
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.eval.evaluator import compute_ate  # noqa: E402
from mobile_slam_tpu.factors import marginalization  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.solver import lm  # noqa: E402


def arg(name, default):
    return next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


SEEDS = int(arg("seeds", "8"))
DURATION = float(arg("duration", "14"))
ARMS = arg("arms", "dense,sqrtfull").split(",")
OUT = arg("out", "/tmp/multiseed_feat.json")
CHUNK = 50


def set_arm(arm):
    tokens = arm.split(":")
    marginalization.RESTRICTED_SUPPORT = (tokens[0] == "restricted")
    marginalization.enable_sqrt_pipeline(tokens[0] == "sqrtfull")
    for t in tokens[1:]:
        k, v = t.split("=")
        if k == "ftol":
            lm.EARLY_EXIT_FTOL = None if v in ("none", "off") else float(v)
        elif k == "batchcand":
            lm.BATCH_CANDIDATES = v not in ("0", "false")
        elif k == "iters":
            return int(v)
    return None


def run_seed(engine, step, cfg, data):
    engine.reset()
    est_ts, est_p = [], []
    imu_i = 0
    init_frame = None
    fi = 0
    n = len(data.frames)

    def body_p(pose):
        r_wb = pose[:3, :3] @ cfg.camera.r_ic_mat.T
        return pose[:3, 3] - r_wb @ cfg.camera.t_ic_vec

    while fi < n:
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        if res.ok and res.pose is not None:
            est_ts.append(ts)
            est_p.append(body_p(res.pose))
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
        if init_frame is not None and fi >= init_frame + 3:
            break
    if init_frame is None:
        return {"ate": float("nan"), "init": False, "poses": 0}

    state = engine.state
    t0_seq = engine._t0
    while fi + CHUNK <= n:
        inputs = [bench.frame_input(cfg, data, fi + k, t0_seq)
                  for k in range(CHUNK)]
        state, (p_out, q_out, ok, kf) = step(
            state, chunked.stack_frame_inputs(inputs))
        p_np = np.asarray(p_out, np.float64)
        ok_np = np.asarray(ok)
        for k in range(CHUNK):
            if ok_np[k]:
                est_ts.append(data.cam_ts[fi + k])
                est_p.append(p_np[k])
        fi += CHUNK
    ate = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                      data.cam_ts, data.gt_p, with_scale=True).rmse
    return {"ate": round(float(ate), 4), "init": True, "poses": len(est_p)}


def main():
    cfg = bench.make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    print(f"[multiseed-feat] device={jax.devices()[0]} seeds={SEEDS} "
          f"duration={DURATION}s arms={ARMS}", file=sys.stderr)
    results = []
    for arm in ARMS:
        iters = set_arm(arm)
        n_iter = iters or cfg.estimator.num_iterations
        engine = VIOEngine(cfg, jnp.float32)
        step = chunked.make_chunked_step(engine.params, n_iter)
        for seed in range(SEEDS):
            scfg = sim.SimConfig(
                duration=DURATION, cam_rate=20.0, imu_rate=200.0,
                num_landmarks=900, max_features=150,
                acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
                acc_bias=(0.01, -0.005, 0.015),
                gyr_bias=(0.001, -0.0005, 0.0008),
                seed=100 + seed,
            )
            data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat,
                                cfg.camera.t_ic_vec)
            t0 = time.perf_counter()
            r = run_seed(engine, step, cfg, data)
            r.update(arm=arm, seed=100 + seed,
                     wall_s=round(time.perf_counter() - t0, 1))
            results.append(r)
            print(f"[multiseed-feat] {json.dumps(r)}", flush=True)
        # Reset flags between arms.
        set_arm("dense")
        lm.EARLY_EXIT_FTOL = None

    print("\n=== summary ===")
    for arm in ARMS:
        ates = np.array([r["ate"] for r in results
                         if r["arm"] == arm and r["init"]])
        ninit = sum(1 for r in results if r["arm"] == arm and not r["init"])
        ok = ates[np.isfinite(ates)]
        if len(ok):
            print(f"{arm:16s} ATE median={np.median(ok):.3f} "
                  f"mean={ok.mean():.3f} max={ok.max():.3f} "
                  f"init_failures={ninit}")
        else:
            print(f"{arm:16s} no successful runs")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[multiseed-feat] wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
