"""Multi-seed image-path A/B: ATE distributions, not single draws.

ROUND2_NOTES' open question: near the monocular scale-stability boundary,
single-seed A/Bs (dense vs restricted marginalization, XLA vs Pallas
tracker) are chaos draws — one trajectory realization can flip the verdict.
This harness runs the FULL image path (rendered frames -> tracker ->
estimator, engine warmup + chunked scan) across N independent noise seeds
for each arm and reports the ATE distribution + scale-gate trip counts,
which is the statistically meaningful comparison
(reference acceptance analog: tests/test_vio_engine_parity.cpp runs one
sequence; we need distributions because our A/B question is stability).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_multiseed.py \
      [--seeds=8] [--duration=14] [--arms=dense,restricted] [--cpu] \
      [--out=/tmp/multiseed.json]

Rendered frames are cached per seed under /tmp/multiseed_cache (uint8) so
the second arm pays no render cost.
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


def arg(name, default):
    return next((a.split("=", 1)[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


SEEDS = int(arg("seeds", "8"))
DURATION = float(arg("duration", "14"))
ARMS = arg("arms", "dense,restricted").split(",")
OUT = arg("out", "/tmp/multiseed.json")
CACHE = "/tmp/multiseed_cache"
CHUNK = 50


def make_data(seed, cfg, cam):
    scfg = sim.SimConfig(
        duration=DURATION, cam_rate=20.0, imu_rate=200.0,
        num_landmarks=900, max_features=150,
        acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
        seed=seed,
    )
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    os.makedirs(CACHE, exist_ok=True)
    path = f"{CACHE}/seed{seed}_d{int(DURATION)}.npy"
    if os.path.exists(path):
        frames = np.load(path)
    else:
        t0 = time.perf_counter()
        frames = np.stack([
            np.clip(np.round(sim.render_frame(
                data, fi, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)),
                0, 255).astype(np.uint8)
            for fi in range(len(data.frames))
        ])
        np.save(path, frames)
        print(f"[multiseed] seed {seed}: rendered {len(frames)} frames "
              f"in {time.perf_counter()-t0:.0f}s", file=sys.stderr)
    return data, frames


def run_one(engine, step_img, cfg, data, frames):
    """Warm up (host streaming) until TRACKING, then chunked image scan.

    Returns dict with ate_sim3, gate trips, poses."""
    engine.reset()
    est_ts, est_p = [], []
    imu_i = 0
    init_frame = None
    fi = 0
    n_img = len(frames)
    while fi < n_img:
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        res = engine.process_frame(frames[fi].astype(np.float64), ts)
        if res.ok:
            p, _, _ = engine.get_body_state()
            est_ts.append(ts)
            est_p.append(p)
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
        if init_frame is not None and fi >= init_frame + 3:
            break
    if init_frame is None:
        return {"ate": float("nan"), "init": False, "poses": 0,
                "gate_trips": 0, "frames": n_img}

    carry = chunked.ImageChunkCarry(
        est_state=engine.state, tracker_state=engine.tracker_state,
        banned_ids=engine._banned_ids, key=engine._key,
        depth_ema=jnp.asarray(engine._depth_ema or 0.0, jnp.float32),
        vel_ema=jnp.asarray(engine._vel_ema, jnp.float32),
    )
    t0_seq = engine._t0
    dtype = jnp.float32
    m_pad = cfg.estimator.max_imu_per_interval
    gate_trips = 0
    while fi + CHUNK <= n_img:
        inputs = []
        for k in range(CHUNK):
            j = fi + k
            t1 = data.cam_ts[j]
            tp = data.cam_ts[j - 1]
            dt, acc, gyr = sim.imu_between(data, tp, t1)
            m = min(len(dt), m_pad)

            def pad(a, n_p, sh):
                out = np.zeros((n_p,) + sh)
                out[:len(a)] = a[:n_p]
                return out

            inputs.append(chunked.ImageFrameInput(
                img=jnp.asarray(frames[j], dtype),
                ts=jnp.asarray(t1 - t0_seq, dtype),
                imu_dt=jnp.asarray(pad(dt, m_pad, ()), dtype),
                imu_acc=jnp.asarray(pad(acc, m_pad, (3,)), dtype),
                imu_gyr=jnp.asarray(pad(gyr, m_pad, (3,)), dtype),
                imu_cnt=jnp.asarray(m, jnp.int32),
            ))
        batch = jax.device_put(chunked.stack_image_inputs(inputs))
        carry, (p_out, q_out, ok, kf) = step_img(carry, batch)
        p_np = np.asarray(p_out, np.float64)
        ok_np = np.asarray(ok)
        gate_trips += int((~ok_np).sum())
        for k in range(CHUNK):
            if ok_np[k]:
                est_ts.append(data.cam_ts[fi + k])
                est_p.append(p_np[k])
        fi += CHUNK

    ate = float("nan")
    if len(est_p) > 10:
        ate = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                          data.cam_ts, data.gt_p, with_scale=True).rmse
    return {"ate": float(ate), "init": True, "poses": len(est_p),
            "gate_trips": gate_trips, "frames": n_img}


def main():
    cfg = bench.make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    print(f"[multiseed] device={jax.devices()[0]} seeds={SEEDS} "
          f"duration={DURATION}s arms={ARMS}", file=sys.stderr)

    results = []
    for arm in ARMS:
        # Arm syntax: "dense" | "restricted", optionally ":accn=<val>" to
        # override the estimator's accelerometer noise density (scale-
        # observability experiments: acc_n weights the IMU factors that
        # carry the monocular-scale information).
        tokens = arm.split(":")
        marginalization.RESTRICTED_SUPPORT = (tokens[0] == "restricted")
        # "sqrtfull" = full square-root prior pipeline (margin-old QR +
        # margin-new Householder, marginalization.enable_sqrt_pipeline).
        marginalization.enable_sqrt_pipeline(tokens[0] == "sqrtfull")
        arm_cfg = cfg
        import dataclasses as _dc
        for t in tokens[1:]:
            k, v = t.split("=")
            if k == "accn":
                arm_cfg = arm_cfg.replace(estimator=_dc.replace(
                    arm_cfg.estimator, acc_n=float(v)))
            elif k == "iters":
                arm_cfg = arm_cfg.replace(estimator=_dc.replace(
                    arm_cfg.estimator, num_iterations=int(v)))
            elif k == "sqrtnew":
                marginalization.SQRT_MARGIN_NEW = v not in ("0", "false")
            elif k == "refill":
                arm_cfg = arm_cfg.replace(tracker=_dc.replace(
                    arm_cfg.tracker, refill_min_deficit=int(v)))
            elif k == "ftol":
                from mobile_slam_tpu.solver import lm as _lm
                _lm.EARLY_EXIT_FTOL = (None if v in ("none", "off")
                                       else float(v))
            elif k == "greedy":
                from mobile_slam_tpu.solver import lm as _lm
                _lm.GREEDY_GN = v not in ("0", "false")
            elif k == "ransac":
                arm_cfg = arm_cfg.replace(tracker=_dc.replace(
                    arm_cfg.tracker, ransac_iters=int(v)))
            elif k == "fbmode":
                arm_cfg = arm_cfg.replace(tracker=_dc.replace(
                    arm_cfg.tracker, fb_mode=v))
            elif k == "anchiters":
                arm_cfg = arm_cfg.replace(tracker=_dc.replace(
                    arm_cfg.tracker, anchor_iters=int(v)))
            elif k == "maxpts":
                arm_cfg = arm_cfg.replace(tracker=_dc.replace(
                    arm_cfg.tracker, max_points=int(v)))
            elif k == "batchcand":
                from mobile_slam_tpu.solver import lm as _lm
                _lm.BATCH_CANDIDATES = v not in ("0", "false")
            elif k == "luransac":
                from mobile_slam_tpu.ops import ransac as _rs
                _rs.USE_LU_HYPOTHESES = v not in ("0", "false")
        # Fresh engine + chunked step per arm so new traces pick up the
        # factorization toggle; reused across seeds (reset()) so each arm
        # pays exactly one compile.
        engine = VIOEngine(arm_cfg, jnp.float32)
        step_img = chunked.make_chunked_image_step(
            engine.params, arm_cfg.estimator.num_iterations, arm_cfg.tracker,
            engine.camera, arm_cfg.camera.focal_length,
        )
        for seed in range(SEEDS):
            data, frames = make_data(100 + seed, cfg, cam)
            t0 = time.perf_counter()
            r = run_one(engine, step_img, arm_cfg, data, frames)
            r.update(arm=arm, seed=100 + seed,
                     wall_s=round(time.perf_counter() - t0, 1))
            results.append(r)
            print(f"[multiseed] {json.dumps(r)}", flush=True)

    print("\n=== summary ===")
    for arm in ARMS:
        ates = np.array([r["ate"] for r in results
                         if r["arm"] == arm and r["init"]])
        trips = [r["gate_trips"] for r in results if r["arm"] == arm]
        ninit = sum(1 for r in results if r["arm"] == arm and not r["init"])
        ok_ates = ates[np.isfinite(ates)]
        if len(ok_ates):
            print(f"{arm:12s} ATE median={np.median(ok_ates):.3f} "
                  f"mean={ok_ates.mean():.3f} max={ok_ates.max():.3f} "
                  f"runs_with_gate_trips="
                  f"{sum(1 for t in trips if t > 0)}/{len(trips)} "
                  f"init_failures={ninit}")
        else:
            print(f"{arm:12s} no successful runs (init_failures={ninit})")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[multiseed] wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
