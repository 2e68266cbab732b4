"""Gyro/accel bias convergence probe (ROUND1 issue #2: slow gyro-bias
convergence because information flowed only through the prior — root cause
was the margin-new elimination bug, fixed in round 2).

Runs the feature-level noisy sim with known injected biases and prints the
window-tip bias estimates vs truth over time.

Usage: PYTHONPATH=.:... python scripts/dev_bias_convergence.py [--duration=20]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera

sys.path.insert(0, "tests")
from test_engine_e2e import tumvi_cfg  # noqa: E402

DURATION = float(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--duration=")), 20.0))
BG_TRUE = np.array([0.004, -0.003, 0.005])
BA_TRUE = np.array([0.03, -0.02, 0.04])


def main():
    cfg = tumvi_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    scfg = sim.SimConfig(
        duration=DURATION, num_landmarks=700, max_features=120,
        acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=tuple(BA_TRUE), gyr_bias=tuple(BG_TRUE), seed=7,
    )
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    engine = VIOEngine(cfg, jnp.float32)

    imu_i = 0
    W = 11
    for fi, ts in enumerate(data.cam_ts):
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        if res.status == Status.TRACKING and fi % 20 == 0:
            bg = np.asarray(engine.state.window.bg[W - 1])
            ba = np.asarray(engine.state.window.ba[W - 1])
            ebg = np.linalg.norm(bg - BG_TRUE) / np.linalg.norm(BG_TRUE)
            eba = np.linalg.norm(ba - BA_TRUE) / np.linalg.norm(BA_TRUE)
            print(f"t={ts:5.1f}s  bg_err={100*ebg:6.1f}%  "
                  f"ba_err={100*eba:6.1f}%  bg={bg.round(5)}  ba={ba.round(4)}")
    bg = np.asarray(engine.state.window.bg[W - 1])
    ba = np.asarray(engine.state.window.ba[W - 1])
    print(f"final: bg={bg.round(5)} (true {BG_TRUE}), "
          f"ba={ba.round(4)} (true {BA_TRUE})")


if __name__ == "__main__":
    main()
