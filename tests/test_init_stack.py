"""Unit tests for the initialization solvers, each validated in isolation
against synthetic ground truth (VERDICT round-1 item 9):

* np_geometry.solve_relative_rt — 8-point essential RANSAC + cheirality
  (solve_5pts.cpp:7-43)
* np_geometry.solve_pnp / triangulate_point (initial_sfm.cpp:8-66)
* alignment.solve_gyroscope_bias — recovers an injected gyro bias
  (initial_alignment.cpp:10-66)
* alignment.linear_alignment + refine_gravity — recovers metric scale,
  gravity direction, and per-frame velocities (initial_alignment.cpp:84-240)
* alignment.check_imu_excitation (initializer.cpp:47-129)
"""

import numpy as np
import pytest

from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.init import alignment as al
from mobile_slam_tpu.init import np_geometry as g

G_NORM = 9.81007
T_IC = np.array([0.045, 0.073, -0.044])


# ---------------------------------------------------------------------------
# Geometry solvers
# ---------------------------------------------------------------------------

def _two_view(seed=0, n=60, rot_deg=6.0, baseline=0.4, noise=0.0):
    """Synthetic two-view problem in normalized coordinates. Returns
    (corres, R_gt, t_gt) with the solve_relative_rt output convention:
    R, t map frame-2 coordinates into frame-1."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 9], (n, 3))
    th = np.deg2rad(rot_deg)
    c, s = np.cos(th), np.sin(th)
    R21 = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])  # cam2-from-cam1
    t21 = np.array([-baseline, 0.05, 0.02])
    corres = []
    for X in pts:
        x1 = X / X[2]
        Xc2 = R21 @ X + t21
        x2 = Xc2 / Xc2[2]
        if noise:
            x1 = x1 + np.append(rng.normal(0, noise, 2), 0.0)
            x2 = x2 + np.append(rng.normal(0, noise, 2), 0.0)
        corres.append((x1, x2))
    R_gt = R21.T
    t_gt = -R21.T @ t21
    return corres, R_gt, t_gt


class TestRelativeRT:
    def test_exact(self):
        corres, R_gt, t_gt = _two_view()
        ok, R, t = g.solve_relative_rt(corres)
        assert ok
        ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2,
                                           -1, 1)))
        assert ang < 0.5, f"rotation error {ang:.2f} deg"
        cosang = abs(t @ t_gt) / (np.linalg.norm(t) * np.linalg.norm(t_gt))
        assert np.rad2deg(np.arccos(np.clip(cosang, -1, 1))) < 2.0

    def test_noisy_with_outliers(self):
        corres, R_gt, t_gt = _two_view(seed=1, n=80, noise=0.5 / 460.0)
        rng = np.random.default_rng(2)
        for i in rng.choice(len(corres), 15, replace=False):
            a, b = corres[i]
            corres[i] = (a, b + np.array([0.08, -0.05, 0.0]))
        ok, R, t = g.solve_relative_rt(corres)
        assert ok
        ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2,
                                           -1, 1)))
        # 8-point under 0.5px-equivalent noise; the init BA refines this.
        assert ang < 2.5, f"rotation error {ang:.2f} deg"

    def test_rejects_too_few(self):
        corres, _, _ = _two_view(n=10)
        ok, _, _ = g.solve_relative_rt(corres)
        assert not ok

    def test_5pt_candidates_exact(self):
        """The Stewenius minimal solver recovers the true E (epipolar
        residual ~0) from 5 exact correspondences."""
        corres, _, _ = _two_view(n=5)
        p1 = np.asarray([c[0][:2] for c in corres])
        p2 = np.asarray([c[1][:2] for c in corres])
        cands = g._essential_5pt_candidates(p1, p2)
        assert cands, "no real candidates"
        best = min(float(g._epipolar_dist(E, p1, p2).max()) for E in cands)
        assert best < 1e-8, f"best max epipolar residual {best:.2e}"

    def test_planar_scene(self):
        """ALL landmarks on one plane: the 8-point linear system is
        degenerate (3-dim solution family) and the recovered translation
        is garbage (scripts/dev_5pt_ab.py / artifacts/ab_5pt_r5.json: tdir
        ~70 deg median); the default 5-point path must return a VALID
        plane-induced pose. A planar two-view has a fundamental two-fold
        (twisted-pair) ambiguity that cheirality cannot always break — the
        reference's cv::recoverPose has the same property — so the
        contract tested here is: the answer matches ONE of the homography
        decompositions of the true plane motion."""
        import cv2

        n_good = 0
        for seed in range(4):
            rng = np.random.default_rng(seed)
            # Ground plane seen pitched-down (the mobile bootstrap case).
            xy = rng.uniform(-2.0, 2.0, (60, 2))
            world = np.concatenate([xy, np.zeros((60, 1))], axis=1)
            R_cw = cv2.Rodrigues(np.array([np.deg2rad(-60.0), 0, 0]))[0]
            t_w0 = np.array([0.0, 2.5, 2.0])
            dR = cv2.Rodrigues(rng.normal(scale=0.08, size=3))[0]
            dt = rng.normal(size=3)
            dt = 0.35 * dt / np.linalg.norm(dt)
            c1 = (world - t_w0) @ R_cw.T
            c2 = (world - t_w0 - dt) @ (dR @ R_cw).T
            ok_z = (c1[:, 2] > 0.2) & (c2[:, 2] > 0.2)
            c1, c2 = c1[ok_z], c2[ok_z]
            if len(c1) < 20:
                continue
            noise = 0.25 / 460.0
            corres = []
            for a, b in zip(c1, c2):
                x1 = a / a[2] + np.append(rng.normal(0, noise, 2), 0.0)
                x2 = b / b[2] + np.append(rng.normal(0, noise, 2), 0.0)
                corres.append((x1, x2))
            ok, R, t = g.solve_relative_rt(corres, seed=seed)
            if not ok:
                continue
            # True plane in cam-1 coords: normal + distance for H = R+tn^T/d.
            R21 = (dR @ R_cw) @ R_cw.T
            t21 = -(dR @ R_cw) @ dt
            n_w = np.array([0.0, 0.0, 1.0])
            n_c1 = R_cw @ n_w
            d = abs(np.dot(n_w, t_w0) - 0.0)  # plane z=0, cam at t_w0
            H = R21 + np.outer(t21, n_c1) / d
            _, Rs, Ts, _ = cv2.decomposeHomographyMat(H, np.eye(3))
            R21_ret, t21_ret = R.T, -R.T @ t
            best = np.inf
            for Ri, Ti in zip(Rs, Ts):
                Ti = Ti.ravel()
                if np.linalg.norm(Ti) < 1e-9:
                    continue
                ang = np.rad2deg(np.arccos(np.clip(
                    (np.trace(R21_ret.T @ Ri) - 1) / 2, -1, 1)))
                ca = abs(t21_ret @ Ti) / (np.linalg.norm(t21_ret)
                                          * np.linalg.norm(Ti))
                td = np.rad2deg(np.arccos(np.clip(ca, -1, 1)))
                best = min(best, max(ang, td))
            if best < 8.0:
                n_good += 1
        assert n_good >= 3, f"only {n_good}/4 planar bootstraps valid"

    def test_minimal_correspondence_count(self):
        """16 correspondences (the reference gate is >=15): 5-point must
        succeed where 8-point RANSAC starves (ab_5pt_r5.json: 8pt success
        0.03-0.13 at this count)."""
        n_ok = 0
        for seed in range(6):
            corres, R_gt, _ = _two_view(seed=seed, n=16,
                                        noise=0.25 / 460.0)
            ok, R, _ = g.solve_relative_rt(corres, seed=seed)
            if not ok:
                continue
            ang = np.rad2deg(np.arccos(np.clip(
                (np.trace(R.T @ R_gt) - 1) / 2, -1, 1)))
            if ang < 2.0:
                n_ok += 1
        assert n_ok >= 5, f"only {n_ok}/6 minimal-count successes"


class TestTriangulatePnP:
    def test_triangulate_point(self):
        X_gt = np.array([0.7, -0.4, 6.0])
        P0 = np.hstack([np.eye(3), np.zeros((3, 1))])
        th = 0.08
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        t = np.array([-0.5, 0.0, 0.1])
        P1 = np.hstack([R, t[:, None]])
        x0 = X_gt[:2] / X_gt[2]
        Xc1 = R @ X_gt + t
        x1 = Xc1[:2] / Xc1[2]
        X = g.triangulate_point(P0, P1, x0, x1)
        np.testing.assert_allclose(X, X_gt, atol=1e-9)

    def test_pnp_recovers_pose(self):
        rng = np.random.default_rng(3)
        pts3 = rng.uniform([-3, -3, 3], [3, 3, 10], (40, 3))
        th = 0.3
        R_gt = np.array([[np.cos(th), -np.sin(th), 0],
                         [np.sin(th), np.cos(th), 0], [0, 0, 1]])
        t_gt = np.array([0.4, -0.2, 0.6])
        pc = pts3 @ R_gt.T + t_gt
        obs = pc[:, :2] / pc[:, 2:3]
        ok, R, t = g.solve_pnp(pts3, obs)
        assert ok
        np.testing.assert_allclose(R, R_gt, atol=1e-6)
        np.testing.assert_allclose(t, t_gt, atol=1e-6)

    def test_pnp_with_prior_and_noise(self):
        rng = np.random.default_rng(4)
        pts3 = rng.uniform([-3, -3, 3], [3, 3, 10], (60, 3))
        th = 0.1
        R_gt = np.array([[1, 0, 0],
                         [0, np.cos(th), -np.sin(th)],
                         [0, np.sin(th), np.cos(th)]])
        t_gt = np.array([-0.1, 0.3, 0.2])
        pc = pts3 @ R_gt.T + t_gt
        obs = pc[:, :2] / pc[:, 2:3] + rng.normal(0, 0.3 / 460, (60, 2))
        ok, R, t = g.solve_pnp(pts3, obs, R_init=np.eye(3),
                               t_init=np.zeros(3))
        assert ok
        assert np.linalg.norm(t - t_gt) < 0.02
        ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2,
                                           -1, 1)))
        assert ang < 0.3


# ---------------------------------------------------------------------------
# Visual-inertial alignment
# ---------------------------------------------------------------------------

def _make_frames(n_frames=12, frame_dt=0.25, imu_rate=100.0,
                 gyr_bias=np.zeros(3), scale=1.0, seed=0):
    """Frames with GT rotations + scale-free camera positions and
    preintegrations from ideal IMU (+ optional injected gyro bias)."""
    duration = n_frames * frame_dt + 0.5
    traj = sim.make_trajectory(duration, imu_rate, g_norm=G_NORM, seed=seed)
    step = int(round(frame_dt * imu_rate))
    frames = []
    for k in range(n_frames):
        i = k * step
        R_wb = sim._quat_to_rot_np(traj.q[i])
        p_cam = traj.p[i] + R_wb @ T_IC
        f = al.HostFrame(traj.ts[i], {}, None)
        f.R = R_wb
        f.T = p_cam / scale
        if k > 0:
            j0 = (k - 1) * step
            gyr = traj.gyr_body[j0 + 1:i + 1] + gyr_bias
            acc = traj.acc_body[j0 + 1:i + 1]
            dt = np.diff(traj.ts[j0:i + 1])
            f.pre = al.NpPreintegration(
                traj.acc_body[j0], traj.gyr_body[j0] + gyr_bias, dt, acc, gyr)
        frames.append(f)
    return frames, traj, step


class TestGyroBias:
    def test_recovers_injected_bias(self):
        bg = np.array([0.02, -0.015, 0.01])
        frames, _, _ = _make_frames(gyr_bias=bg)
        delta_bg, clamped = al.solve_gyroscope_bias(frames)
        assert not clamped
        err = np.linalg.norm(delta_bg - bg) / np.linalg.norm(bg)
        assert err < 0.1, f"gyro bias error {err*100:.1f}% ({delta_bg} vs {bg})"

    def test_rejected_attempt_does_not_poison_later_attempts(self):
        """Init attempts share HostFrame preintegrations. A first attempt
        with garbage SfM rotations produces a clamped (rejected) bias —
        it must leave the preintegrations UNTOUCHED, and a later attempt
        with good rotations must still recover the true bias. Before the
        fix, the rejected attempt repropagated with its clamp value and
        the next attempt treated its own correction as absolute, seeding
        tracking with a ~0.05 rad/s bias error (observed as the EuRoC
        noiseless e2e running away into a reset at frame 60)."""
        bg = np.array([0.02, -0.015, 0.01])
        frames, _, _ = _make_frames(gyr_bias=bg)
        dq_before = [f.pre.delta_q.copy() for f in frames if f.pre is not None]

        # Attempt 1: corrupt the rotations -> garbage bias -> rejected.
        good_R = [f.R.copy() for f in frames]
        rng = np.random.default_rng(9)
        for f in frames:
            w = rng.normal(scale=0.5, size=3)
            f.R = f.R @ g.exp_so3(w)
        delta1, clamped1 = al.solve_gyroscope_bias(frames)
        assert clamped1, "garbage rotations should clamp"
        dq_after = [f.pre.delta_q.copy() for f in frames if f.pre is not None]
        for a, b in zip(dq_before, dq_after):
            np.testing.assert_array_equal(
                a, b, err_msg="rejected attempt mutated preintegrations")

        # Attempt 2: good rotations -> true bias, unpoisoned.
        for f, R in zip(frames, good_R):
            f.R = R
        delta2, clamped2 = al.solve_gyroscope_bias(frames)
        assert not clamped2
        err = np.linalg.norm(delta2 - bg) / np.linalg.norm(bg)
        assert err < 0.1, f"bias after rejected attempt: {delta2} vs {bg}"

    def test_accepted_attempts_accumulate_bias_correctly(self):
        """Two consecutive ACCEPTED solves (re-attempt after a downstream
        alignment rejection) must converge on the true bias, not apply the
        second correction as if the linearization were still at zero."""
        bg = np.array([0.02, -0.015, 0.01])
        frames, _, _ = _make_frames(gyr_bias=bg)
        d1, c1 = al.solve_gyroscope_bias(frames)
        assert not c1
        d2, c2 = al.solve_gyroscope_bias(frames)
        assert not c2
        err = np.linalg.norm(d2 - bg) / np.linalg.norm(bg)
        assert err < 0.1, f"second solve drifted: {d2} vs {bg}"

    def test_zero_bias_stays_zero(self):
        frames, _, _ = _make_frames()
        delta_bg, clamped = al.solve_gyroscope_bias(frames)
        assert not clamped
        assert np.linalg.norm(delta_bg) < 2e-3

    def test_clamps_garbage_rotations(self):
        frames, _, _ = _make_frames()
        rng = np.random.default_rng(5)
        for f in frames[1::2]:
            w = rng.normal(0, 0.5, 3)
            f.R = f.R @ g.exp_so3(w)
        _, clamped = al.solve_gyroscope_bias(frames)
        assert clamped


class TestLinearAlignment:
    def test_recovers_scale_gravity_velocity(self):
        s_true = 2.37
        frames, traj, step = _make_frames(scale=s_true)
        ok, gvec, x = al.linear_alignment(frames, G_NORM, T_IC)
        assert ok
        s = x[-1]
        assert abs(s - s_true) / s_true < 0.05, f"scale {s:.3f} vs {s_true}"
        # Gravity in the world frame of this test is +z (acc_body convention
        # in make_trajectory).
        g_dir = gvec / np.linalg.norm(gvec)
        assert g_dir @ np.array([0, 0, 1.0]) > 0.999
        assert abs(np.linalg.norm(gvec) - G_NORM) < 0.05
        # Velocities are solved in body frames.
        for k in (0, len(frames) - 1):
            v_body_gt = frames[k].R.T @ traj.v[k * step]
            assert np.linalg.norm(x[3 * k:3 * k + 3] - v_body_gt) < 0.1

    def test_rejects_degenerate_motion(self):
        # Constant-velocity, rotation-free frames: scale/gravity are
        # unobservable; the solver must not return a confident garbage fit.
        n = 12
        frames = []
        v = np.array([0.3, 0.0, 0.0])
        for k in range(n):
            f = al.HostFrame(0.25 * k, {}, None)
            f.R = np.eye(3)
            f.T = v * (0.25 * k)
            if k > 0:
                m = 25
                dt = np.full(m, 0.01)
                acc = np.tile([0.0, 0.0, G_NORM], (m, 1))
                gyr = np.zeros((m, 3))
                f.pre = al.NpPreintegration(acc[0], gyr[0], dt, acc, gyr)
            frames.append(f)
        ok, gvec, x = al.linear_alignment(frames, G_NORM, T_IC)
        if ok:
            # If it claims success the gravity must at least be sane.
            assert abs(np.linalg.norm(gvec) - G_NORM) < 0.5


class TestExcitation:
    def test_dynamic_passes(self):
        frames, _, _ = _make_frames()
        assert al.check_imu_excitation(frames)

    def test_static_fails(self):
        n = 11
        frames = []
        for k in range(n):
            f = al.HostFrame(0.25 * k, {}, None)
            if k > 0:
                m = 25
                dt = np.full(m, 0.01)
                acc = np.tile([0.0, 0.0, G_NORM], (m, 1))
                gyr = np.zeros((m, 3))
                f.pre = al.NpPreintegration(acc[0], gyr[0], dt, acc, gyr)
            frames.append(f)
        assert not al.check_imu_excitation(frames)


class TestFullAlignment:
    def test_visual_imu_alignment_end_to_end(self):
        bg = np.array([0.01, -0.02, 0.015])
        s_true = 1.8
        frames, _, _ = _make_frames(gyr_bias=bg, scale=s_true)
        ok, delta_bg, gvec, x = al.visual_imu_alignment(frames, G_NORM, T_IC)
        assert ok
        assert np.linalg.norm(delta_bg - bg) / np.linalg.norm(bg) < 0.1
        assert abs(x[-1] - s_true) / s_true < 0.05
        assert abs(np.linalg.norm(gvec) - G_NORM) < 0.05
