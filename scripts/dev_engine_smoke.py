"""Dev smoke: the FULL engine including from-scratch initialization.

Feeds synthetic IMU + feature observations through VIOEngine.process_features
(the reference's headless parity workload), then evaluates ATE against
ground truth with the Sim(3)-aligned evaluator.
"""

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
if "--f64" in sys.argv:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.eval.evaluator import compute_ate
from mobile_slam_tpu.models.cameras.base import make_camera

DTYPE = jnp.float64 if "--f64" in sys.argv else jnp.float32

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])


def main():
    if "--pinhole" in sys.argv:
        cam_cfg = CameraConfig(
            model_type="PINHOLE", width=640, height=480,
            focal_length=460.0, fx=460.0, fy=460.0, cx=320.0, cy=240.0,
            r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.05, 0.02, -0.03),
        )
    else:
        # TUM-VI-like Kannala-Brandt fisheye (config/tum_vi_room1.yaml).
        cam_cfg = CameraConfig(
            model_type="KANNALA_BRANDT", width=512, height=512,
            focal_length=190.97847715128717,
            fx=190.97847715128717, fy=190.9733070521226,
            cx=254.93170605935475, cy=256.8974428996504,
            dist=(0.0034823894022493434, 0.0007150348452162257,
                  -0.0020532361418706202, 0.00020293673591811182),
            r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.05, 0.02, -0.03),
        )
    cfg = VIOConfig(
        camera=cam_cfg,
        tracker=TrackerConfig(max_cnt=120, max_points=144),
        estimator=EstimatorConfig(
            max_features=256, max_imu_per_interval=16, num_iterations=8,
            acc_n=0.05, gyr_n=0.004, acc_w=4e-5, gyr_w=2e-6,
        ),
    )
    cam = make_camera(cam_cfg, dtype=jnp.float64)
    if "--clean" in sys.argv:
        scfg = sim.SimConfig(duration=10.0, num_landmarks=600,
                             max_features=120)
    elif "--imunoise" in sys.argv:
        scfg = sim.SimConfig(
            duration=10.0, num_landmarks=600, max_features=120,
            acc_noise=0.05, gyr_noise=0.004, pixel_noise=0.0,
            acc_bias=(0.02, -0.01, 0.03), gyr_bias=(0.002, -0.001, 0.0015),
        )
    elif "--pixnoise" in sys.argv:
        scfg = sim.SimConfig(
            duration=10.0, num_landmarks=600, max_features=120,
            acc_noise=0.0, gyr_noise=0.0, pixel_noise=0.5,
        )
    else:
        scfg = sim.SimConfig(
            duration=10.0, num_landmarks=600, max_features=120,
            acc_noise=0.05, gyr_noise=0.004, pixel_noise=0.5,
            acc_bias=(0.02, -0.01, 0.03), gyr_bias=(0.002, -0.001, 0.0015),
        )
    data = sim.simulate(scfg, cam, cam_cfg.r_ic_mat, cam_cfg.t_ic_vec)
    print(f"sim: {len(data.frames)} frames")

    engine = VIOEngine(cfg, DTYPE)

    est_ts, est_p = [], []
    imu_i = 0
    t0 = time.time()
    init_frame = None
    for fi, ts in enumerate(data.cam_ts):
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        if res.status == Status.TRACKING and init_frame is None:
            init_frame = fi
            print(f"initialized at frame {fi} ({time.time()-t0:.1f}s)")
            # Init-quality diagnostics: window vs GT (gauge-free checks).
            w = engine.state.window
            wp = np.asarray(w.p, float)
            wv = np.asarray(w.v, float)
            gt_win = data.gt_p[fi - 10:fi + 1]
            gt_v_win = data.gt_v[fi - 10:fi + 1]
            d_est = np.linalg.norm(np.diff(wp, axis=0), axis=1)
            d_gt = np.linalg.norm(np.diff(gt_win, axis=0), axis=1)
            print(f"  inter-frame dist est: {d_est.round(3)}")
            print(f"  inter-frame dist gt : {d_gt.round(3)}")
            print(f"  scale ratio est/gt  : {(d_est.sum()/d_gt.sum()):.3f}")
            print(f"  |v| est {np.linalg.norm(wv,axis=1).round(2)}")
            print(f"  |v| gt  {np.linalg.norm(gt_v_win,axis=1).round(2)}")
            print(f"  bg est {np.asarray(w.bg[0]).round(4)} (true {scfg.gyr_bias})")
            print(f"  gravity {np.asarray(engine.params.gravity).round(3)}")
        if res.ok:
            p, q, v = engine.get_body_state()
            est_ts.append(ts)
            est_p.append(p)
        if fi % 40 == 0:
            print(f"f{fi:3d} status={res.status.name} kf={res.is_keyframe}")

    print(f"total wall {time.time()-t0:.1f}s, {len(est_p)} poses")
    if len(est_p) > 10:
        est_p = np.asarray(est_p, float)
        est_ts = np.asarray(est_ts)
        ate = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                          with_scale=False)
        ate_s = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                            with_scale=True)
        print(f"ATE (SE3):  rmse {ate.rmse*100:.2f}cm  median "
              f"{ate.median*100:.2f}cm  n={ate.num_pairs}")
        print(f"ATE (Sim3): rmse {ate_s.rmse*100:.2f}cm  median "
              f"{ate_s.median*100:.2f}cm")
        half = len(est_ts) // 2
        ate_late = compute_ate(est_ts[half:], est_p[half:], data.cam_ts,
                               data.gt_p, with_scale=False)
        print(f"ATE late half (SE3): rmse {ate_late.rmse*100:.2f}cm")
        w = engine.state.window
        print(f"final bg {np.asarray(w.bg[-1]).round(4)} "
              f"ba {np.asarray(w.ba[-1]).round(4)}")
        # Per-frame scale drift: inter-frame distance ratio over time.
        d_est = np.linalg.norm(np.diff(est_p, axis=0), axis=1)
        ia = np.searchsorted(data.cam_ts, est_ts)
        d_gt = np.linalg.norm(np.diff(data.gt_p[ia], axis=0), axis=1)
        ratio = d_est / np.maximum(d_gt, 1e-9)
        for seg in range(0, len(ratio), 40):
            r = ratio[seg:seg + 40]
            print(f"  scale ratio frames {seg:3d}+: {np.median(r):.3f}")
        n_map = len(engine.get_map_points())
        print(f"map points: {n_map}")


if __name__ == "__main__":
    main()
