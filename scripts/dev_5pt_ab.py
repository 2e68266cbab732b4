"""A/B the init relative-pose solver: our 8-point RANSAC vs 5-point.

VERDICT r4 missing #2: the reference bootstraps with cv::findEssentialMat
5-point RANSAC (solve_5pts.cpp:7-43); we substitute normalized 8-point
(init/np_geometry.solve_relative_rt). SURVEY §7 allows that only if
"validated to equal quality" — 8-point is degenerate when the scene is
planar and weaker at minimal correspondence counts, both real mobile
bootstrap cases (pointing at a floor/wall). This harness measures both
solvers on synthetic two-view problems across the hard regimes:

  general   — 3D point cloud, healthy baseline
  planar    — ALL points on one plane (8-point's degeneracy)
  lowpar    — small baseline (parallax just past the init gate)
  minimal   — only 16 correspondences (the reference gate is >=15)

Metrics per (regime, noise, seed): rotation error (deg), translation
DIRECTION error (deg; monocular scale is unobservable), solver success.
Arms:
  ours8  — init/np_geometry.solve_relative_rt (production path)
  cv5    — cv2.findEssentialMat(RANSAC, 5-point) + cv2.recoverPose oracle
  ours5  — init/np_geometry.solve_relative_rt(method="5pt") when present

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_5pt_ab.py
           [--seeds=N] [--json=PATH]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

from mobile_slam_tpu.init import np_geometry as g

N_SEEDS = int(next((a.split("=")[1] for a in sys.argv
                    if a.startswith("--seeds=")), 40))
JSON_OUT = next((a.split("=")[1] for a in sys.argv
                 if a.startswith("--json=")), None)
FOCAL = 460.0


def make_problem(regime: str, noise_px: float, seed: int):
    """Two views of a scene; returns (corres, R_gt, t_gt) with the
    solve_relative_rt convention (frame-j -> frame-i transform)."""
    rng = np.random.default_rng(seed)
    n = 16 if regime == "minimal" else 60

    if regime == "planar":
        # Ground plane 2 m below, camera pitched down ~30deg.
        xy = rng.uniform(-2.0, 2.0, (n, 2))
        pts = np.concatenate([xy, np.zeros((n, 1))], axis=1)
        R_w0 = cv2.Rodrigues(np.array([np.deg2rad(-60.0), 0, 0]))[0]
        t_w0 = np.array([0.0, 2.5, 2.0])
    else:
        pts = np.concatenate([
            rng.uniform(-2.0, 2.0, (n, 2)),
            rng.uniform(2.0, 6.0, (n, 1))], axis=1)
        R_w0 = np.eye(3)
        t_w0 = np.zeros(3)

    base = 0.04 if regime == "lowpar" else 0.35
    ang = 0.01 if regime == "lowpar" else 0.08
    dR = cv2.Rodrigues(rng.normal(scale=ang, size=3))[0]
    dt = rng.normal(scale=1.0, size=3)
    dt = base * dt / np.linalg.norm(dt)

    R_w1 = dR @ R_w0
    t_w1 = t_w0 + rng.normal(scale=0.1, size=3) * 0 + dt

    def project(R_cw, t_cw):
        pc = (pts - t_cw) @ R_cw.T
        return pc

    c0 = project(R_w0, t_w0)
    c1 = project(R_w1, t_w1)
    ok = (c0[:, 2] > 0.2) & (c1[:, 2] > 0.2)
    c0, c1 = c0[ok], c1[ok]
    p0 = c0[:, :2] / c0[:, 2:]
    p1 = c1[:, :2] / c1[:, 2:]
    p0 = p0 + rng.normal(size=p0.shape) * noise_px / FOCAL
    p1 = p1 + rng.normal(size=p1.shape) * noise_px / FOCAL

    corres = [(np.array([a[0], a[1], 1.0]), np.array([b[0], b[1], 1.0]))
              for a, b in zip(p0, p1)]
    # Ground truth j->i transform (frame 1 point x1: x0 = R x1 + T).
    R_gt = R_w0 @ R_w1.T
    t_gt = (t_w1 - t_w0) @ R_w0.T  # direction of frame-1 origin in frame 0
    return corres, R_gt, t_gt


def angle_deg(R_est, R_gt):
    c = (np.trace(R_est.T @ R_gt) - 1.0) / 2.0
    return float(np.rad2deg(np.arccos(np.clip(c, -1.0, 1.0))))


def tdir_deg(t_est, t_gt):
    a = t_est / max(np.linalg.norm(t_est), 1e-12)
    b = t_gt / max(np.linalg.norm(t_gt), 1e-12)
    d = abs(float(np.dot(a, b)))
    return float(np.rad2deg(np.arccos(np.clip(d, 0.0, 1.0))))


def run_cv5(corres):
    p1 = np.asarray([c[0][:2] / c[0][2] for c in corres])
    p2 = np.asarray([c[1][:2] / c[1][2] for c in corres])
    # Reference calling order (solve_5pts.cpp:17-29): points1 = frame-i,
    # points2 = frame-j; recoverPose returns x_j = R x_i + t, and the
    # j->i transform is (R^T, -R^T t) — the reference's final transpose.
    E, mask = cv2.findEssentialMat(
        p1.astype(np.float64), p2.astype(np.float64), np.eye(3),
        cv2.RANSAC, 0.99, 1.0 / FOCAL)
    if E is None or E.shape != (3, 3):
        return False, None, None
    cnt, R, t, _ = cv2.recoverPose(E, p1, p2, np.eye(3), mask=mask)
    if cnt <= 12:
        return False, None, None
    return True, R.T, (-R.T @ t).ravel()


def main():
    regimes = ["general", "planar", "lowpar", "minimal"]
    noises = [0.25, 0.5, 1.0]
    arms = {"ours8": lambda c, s: g.solve_relative_rt(
        c, threshold_focal=FOCAL, seed=s, method="8pt")}
    if hasattr(g, "solve_relative_rt_5pt"):
        arms["ours5"] = lambda c, s: g.solve_relative_rt_5pt(
            c, threshold_focal=FOCAL, seed=s)
    arms["cv5"] = lambda c, s: run_cv5(c)

    results = {}
    for regime in regimes:
        for noise in noises:
            for name in arms:
                rot_errs, t_errs, fails = [], [], 0
                for seed in range(N_SEEDS):
                    corres, R_gt, t_gt = make_problem(regime, noise, seed)
                    ok, R, t = arms[name](corres, seed)
                    if not ok:
                        fails += 1
                        continue
                    rot_errs.append(angle_deg(R, R_gt))
                    t_errs.append(tdir_deg(t, t_gt))
                key = f"{regime}/n{noise}/{name}"
                results[key] = {
                    "success": 1.0 - fails / N_SEEDS,
                    "rot_med_deg": (round(float(np.median(rot_errs)), 3)
                                    if rot_errs else None),
                    "rot_p90_deg": (round(float(np.percentile(rot_errs, 90)),
                                          3) if rot_errs else None),
                    "tdir_med_deg": (round(float(np.median(t_errs)), 3)
                                     if t_errs else None),
                    "tdir_p90_deg": (round(float(np.percentile(t_errs, 90)),
                                           3) if t_errs else None),
                }
                r = results[key]
                print(f"{key:28s} ok={r['success']:.2f} "
                      f"rot {r['rot_med_deg']}/{r['rot_p90_deg']} deg  "
                      f"tdir {r['tdir_med_deg']}/{r['tdir_p90_deg']} deg",
                      flush=True)
    if JSON_OUT:
        with open(JSON_OUT, "w") as f:
            json.dump({"n_seeds": N_SEEDS, "results": results}, f, indent=1)
        print(f"-> {JSON_OUT}")


if __name__ == "__main__":
    main()
