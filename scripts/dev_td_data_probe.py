"""Ground-truth td observability probe on the raw synthetic data.

For each frame pair (anchor at GT pose, target at GT pose, landmark at GT
depth) scan td over a grid and report the td minimizing the reprojection
cost of the td-corrected rays — no estimator in the loop. If the data's
own optimum is ~td_true everywhere, the estimator-side collapse seen in
dev_td_probe.py is a solver artifact; if the optimum itself collapses
after the excitation warmup, the sim/vel generation is inconsistent there.

Usage: JAX_PLATFORMS=cpu python scripts/dev_td_data_probe.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.utils import rotations as rot  # noqa: E402

from test_backend_sim import make_cfg  # noqa: E402

TD_TRUE = 0.010


def main():
    cfg = make_cfg()
    scfg = sim.SimConfig(duration=5.0, num_landmarks=500, max_features=120,
                         cam_time_offset=TD_TRUE)
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    r_ic = np.asarray(cfg.camera.r_ic_mat)
    t_ic = np.asarray(cfg.camera.t_ic_vec)
    lms = data.landmarks

    grid = np.linspace(-0.005, 0.025, 61)
    print("frame |  t(s) | best_td(ms) | relcost(td=0)/cost(best) | mean|vel|")
    for fi in range(12, len(data.frames) - 1, 6):
        fa, fb = data.frames[fi], data.frames[fi + 1]
        ids = np.intersect1d(fa["ids"], fb["ids"])
        if len(ids) < 20:
            continue
        pos_a = {v: k for k, v in enumerate(fa["ids"])}
        pos_b = {v: k for k, v in enumerate(fb["ids"])}
        ia = np.array([pos_a[v] for v in ids])
        ib = np.array([pos_b[v] for v in ids])

        def cam_pose(fj):
            R_wb = np.asarray(rot.quat_to_rot(jnp.asarray(data.gt_q[fj])))
            R_wc = R_wb @ r_ic
            t_wc = data.gt_p[fj] + R_wb @ t_ic
            return R_wc, t_wc

        Ra, ta = cam_pose(fi)
        Rb, tb = cam_pose(fi + 1)
        pts_a = (lms[fa["ids"][ia]] - ta) @ Ra  # camera-frame (GT pose)
        costs = []
        for td in grid:
            ray_a = fa["rays"][ia].copy()
            ray_a[:, :2] -= td * fa["vel"][ia]
            ray_b = fb["rays"][ib].copy()
            ray_b[:, :2] -= td * fb["vel"][ib]
            # anchor-ray depth from GT geometry, project into target
            lam = 1.0 / pts_a[:, 2]
            p_c_a = ray_a / lam[:, None]
            p_w = p_c_a @ Ra.T + ta
            p_c_b = (p_w - tb) @ Rb
            pred = p_c_b[:, :2] / p_c_b[:, 2:3]
            err = pred - ray_b[:, :2]
            costs.append(float(np.mean(err ** 2)))
        costs = np.asarray(costs)
        best = grid[np.argmin(costs)]
        rel = costs[np.argmin(np.abs(grid))] / max(costs.min(), 1e-18)
        mv = float(np.mean(np.linalg.norm(fa["vel"][ia], axis=-1)))
        print(f"{fi:5d} | {data.cam_ts[fi]:5.2f} | {best*1e3:11.2f} | "
              f"{rel:24.2f} | {mv:.3f}")


if __name__ == "__main__":
    main()
