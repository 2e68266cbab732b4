"""Diagnose the non-fisheye config e2e runs (euroc.yaml / kitti360.yaml):
per-frame status trace + ATE, to localize where the pinhole path degrades.

Usage: python scripts/dev_config_e2e.py [euroc|kitti360] [--duration=6]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from mobile_slam_tpu.config import load_config  # noqa: E402
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.eval.evaluator import compute_ate  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402

name = next((a for a in sys.argv[1:] if not a.startswith("-")), "euroc")
duration = float(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--duration=")), 6.0))

cfg = load_config(str(pathlib.Path(__file__).parent.parent
                      / "configs" / f"{name}.yaml"))
cam = make_camera(cfg.camera, dtype=jnp.float64)
scfg = sim.SimConfig(
    duration=duration, num_landmarks=700, max_features=120,
    acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
    acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
    seed=7,
)
data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
n_feat = [len(f["ids"]) for f in data.frames]
print(f"[{name}] features/frame: min {min(n_feat)} median "
      f"{int(np.median(n_feat))} max {max(n_feat)}")

engine = VIOEngine(cfg, jnp.float32)
est_ts, est_p = [], []
imu_i = 0
last_status = None
for fi, ts in enumerate(data.cam_ts):
    while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
        engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                        data.imu_gyr[imu_i])
        imu_i += 1
    f = data.frames[fi]
    res = engine.process_features(ts, f["ids"], f["rays"],
                                  uv=f["uv"], vel=f["vel"])
    if res.status != last_status:
        print(f"  frame {fi}: {last_status} -> {res.status}")
        last_status = res.status
    if res.ok:
        p, _, _ = engine.get_body_state()
        est_ts.append(ts)
        est_p.append(p)

if len(est_p) > 10:
    ate = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                      data.cam_ts, data.gt_p, with_scale=True)
    ate_se3 = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                          data.cam_ts, data.gt_p, with_scale=False)
    print(f"[{name}] poses {len(est_p)}/{len(data.cam_ts)} "
          f"ATE sim3 {ate.rmse:.4f} m se3 {ate_se3.rmse:.4f} m")
else:
    print(f"[{name}] FAILED: only {len(est_p)} poses")
