#!/usr/bin/env python
"""Generate a synthetic EuRoC-layout dataset on disk from the simulator.

Writes mav0/{cam0,imu0,mocap0} with rendered PNG frames, IMU CSV, and
ground-truth CSV — a drop-in stand-in for TUM-VI/EuRoC sequences so the full
dataset workflow (CLI -> VIOSystem -> native loader -> evaluator) runs
without downloads.

    python scripts/make_synthetic_dataset.py --out data/synth_room --duration 20
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--duration", type=float, default=15.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--noise", action="store_true",
                    help="add IMU noise/biases")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from mobile_slam_tpu.config import load_config
    from mobile_slam_tpu.eval import simulation as sim
    from mobile_slam_tpu.models.cameras.base import make_camera

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "tum_vi_room1.yaml"))
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    kw = {}
    if args.noise:
        kw = dict(acc_noise=0.02, gyr_noise=0.002,
                  acc_bias=(0.01, -0.005, 0.015),
                  gyr_bias=(0.001, -0.0005, 0.0008))
    scfg = sim.SimConfig(duration=args.duration, num_landmarks=900,
                         max_features=150, seed=args.seed, **kw)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)

    base = os.path.join(args.out, "mav0")
    os.makedirs(os.path.join(base, "cam0", "data"), exist_ok=True)
    os.makedirs(os.path.join(base, "imu0"), exist_ok=True)
    os.makedirs(os.path.join(base, "mocap0"), exist_ok=True)

    t_epoch = 1.4e9  # realistic absolute epoch
    with open(os.path.join(base, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(data.imu_ts)):
            ns = int(round((t_epoch + data.imu_ts[i]) * 1e9))
            g = data.imu_gyr[i]
            a = data.imu_acc[i]
            f.write(f"{ns},{g[0]},{g[1]},{g[2]},{a[0]},{a[1]},{a[2]}\n")

    with open(os.path.join(base, "mocap0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],px,py,pz,qw,qx,qy,qz\n")
        for i in range(len(data.cam_ts)):
            ns = int(round((t_epoch + data.cam_ts[i]) * 1e9))
            p = data.gt_p[i]
            q = data.gt_q[i]
            f.write(f"{ns},{p[0]},{p[1]},{p[2]},"
                    f"{q[0]},{q[1]},{q[2]},{q[3]}\n")

    with open(os.path.join(base, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for fi in range(len(data.cam_ts)):
            ns = int(round((t_epoch + data.cam_ts[fi]) * 1e9))
            img = sim.render_frame(data, fi, cam, cfg.camera.r_ic_mat,
                                   cfg.camera.t_ic_vec)
            cv2.imwrite(os.path.join(base, "cam0", "data", f"{ns}.png"), img)
            f.write(f"{ns},{ns}.png\n")
            if fi % 50 == 0:
                print(f"rendered {fi}/{len(data.cam_ts)}", file=sys.stderr)

    print(f"dataset written to {args.out} "
          f"({len(data.cam_ts)} frames, {len(data.imu_ts)} IMU samples)")


if __name__ == "__main__":
    main()
