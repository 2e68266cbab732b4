"""Measure per-feature tracker drift against rendered ground truth.

Renders a synthetic sequence (eval/simulation.py), runs the full jitted
tracker over it, associates each track with the landmark whose GT projection
is nearest at detection time, and reports the drift statistics:

  err_t = (uv_t - gt_uv_t) - (uv_det - gt_uv_det)

i.e. how far the track has wandered from its (possibly biased) detection
offset. The reference tolerates ~0.25 px of iid noise (ROUND1_NOTES); the
frame-to-frame LK random walk was ~0.8 px median — this script verifies the
forward-backward + anchor-template fix brings it under ~0.3 px.

Usage: PYTHONPATH=. python scripts/dev_tracker_drift.py [--duration=4] \
           [--no-anchor] [--no-fb] [--oracle]

--oracle renders frames AND computes GT projections through the
independent OpenCV geometry oracle (eval/adversarial.py) instead of the
package's own camera code — the de-circularized variant of this probe
(the tracker is then graded against geometry it did not generate).
"""

import functools
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import CameraConfig, TrackerConfig
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.frontend import tracker as trk
from mobile_slam_tpu.models.cameras.base import make_camera

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])
T_IC = np.array([0.045, 0.073, -0.044])

DURATION = float(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--duration=")), 4.0))


def main():
    cam_cfg = CameraConfig(
        model_type="KANNALA_BRANDT", width=512, height=512,
        focal_length=190.97847715128717,
        fx=190.97847715128717, fy=190.9733070521226,
        cx=254.93170605935475, cy=256.8974428996504,
        dist=(0.0034823894022493434, 0.0007150348452162257,
              -0.0020532361418706202, 0.00020293673591811182),
    )
    cam64 = make_camera(cam_cfg, dtype=jnp.float64)
    cam32 = make_camera(cam_cfg, dtype=jnp.float32)
    cfg = TrackerConfig(
        max_cnt=150, min_dist=20, max_points=192, fisheye=True,
        anchor_refine="--no-anchor" not in sys.argv,
        fb_check="--no-fb" not in sys.argv,
        fb_mode="prior0" if "--fb-prior0" in sys.argv else "pyramid",
        use_pallas=False if "--no-pallas" in sys.argv else None,
    )

    scfg = sim.SimConfig(duration=DURATION, cam_rate=20.0, imu_rate=200.0,
                         num_landmarks=900, max_features=150, seed=7)
    use_oracle = "--oracle" in sys.argv
    if use_oracle:
        from mobile_slam_tpu.eval import adversarial as adv
        data = adv.make_adversarial_data(scfg, cam_cfg, R_IC, T_IC,
                                         adv.NuisanceConfig())
    else:
        data = sim.simulate(scfg, cam64, R_IC, T_IC)
    n = len(data.cam_ts)
    print(f"[drift] {n} frames, anchor={cfg.anchor_refine} "
          f"fb={cfg.fb_check} oracle={use_oracle}")

    step = jax.jit(functools.partial(
        trk.detect_and_track, camera=cam32, cfg=cfg,
        focal=cam_cfg.focal_length))
    state = trk.init_tracker_state(cfg, 512, 512, jnp.float32)
    key = jax.random.PRNGKey(0)

    # GT per-frame landmark projections.
    def gt_uv(fi):
        R_wb = sim._quat_to_rot_np(data.gt_q[fi])
        R_wc = R_wb @ R_IC
        t_wc = data.gt_p[fi] + R_wb @ T_IC
        pts_c = (data.landmarks - t_wc) @ R_wc
        if use_oracle:
            from mobile_slam_tpu.eval import adversarial as adv
            uv = np.zeros((len(pts_c), 2))
            front = pts_c[:, 2] > 0.05
            if front.any():
                uv[front] = adv.oracle_project(cam_cfg, pts_c[front])
            return uv, np.where(front, pts_c[:, 2], -1.0)
        uv = np.asarray(cam64.project(jnp.asarray(pts_c)))
        return uv, pts_c[:, 2]

    assoc = {}       # id -> (landmark idx, offset0 (2,))
    errs = []        # drift magnitudes for tracks with age > 5
    ages = {}
    t0 = time.time()
    for fi in range(n):
        if use_oracle:
            from mobile_slam_tpu.eval import adversarial as adv
            img = adv.render_frame_adversarial(
                data, fi, cam_cfg, R_IC, T_IC, adv.NuisanceConfig())
        else:
            img = sim.render_frame(data, fi, cam64, R_IC, T_IC)
        state, out = step(state, jnp.asarray(img, jnp.float32),
                          jnp.asarray(data.cam_ts[fi], jnp.float32),
                          key=jax.random.fold_in(key, fi))
        ids = np.asarray(state.ids)
        pts = np.asarray(state.pts)
        act = np.asarray(state.active)
        tc = np.asarray(state.track_cnt)
        uv_gt, depth = gt_uv(fi)
        vis = depth > 0.3
        for k in np.where(act)[0]:
            i = int(ids[k])
            if tc[k] == 1:
                d2 = np.sum((uv_gt - pts[k]) ** 2, axis=-1)
                d2[~vis] = np.inf
                li = int(np.argmin(d2))
                if d2[li] < 9.0:
                    assoc[i] = (li, pts[k] - uv_gt[li])
                ages[i] = 1
            elif i in assoc:
                li, off0 = assoc[i]
                ages[i] = ages.get(i, 0) + 1
                if ages[i] > 5:
                    err = pts[k] - uv_gt[li] - off0
                    errs.append(np.linalg.norm(err))
    errs = np.asarray(errs)
    print(f"[drift] wall {time.time()-t0:.1f}s  n_obs={len(errs)}")
    print(f"[drift] median={np.median(errs):.3f}px mean={errs.mean():.3f}px "
          f"p90={np.percentile(errs, 90):.3f}px max={errs.max():.2f}px")


if __name__ == "__main__":
    main()
