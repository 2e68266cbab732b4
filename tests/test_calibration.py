"""Intrinsic refinement tests (CostFunctionFactory analog): perturbed
intrinsics must be recovered from synthetic observations for each model."""

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.models.cameras import equidistant, pinhole
from mobile_slam_tpu.models.cameras.calibration import refine_intrinsics


def synthetic_points(n=300, seed=0, spread=1.2):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(2.0, 6.0, n),
    ], -1)
    return pts


class TestRefineIntrinsics:
    def test_pinhole_recovery(self):
        true = pinhole.make_params(460.0, 458.0, 376.0, 240.0,
                                   -0.28, 0.07, 1e-4, -2e-4,
                                   dtype=jnp.float64)
        pts = synthetic_points()
        uv = pinhole.project(true, jnp.asarray(pts))
        # Perturb focal/center by ~2%, zero the distortion.
        init = pinhole.make_params(450.0, 450.0, 370.0, 245.0,
                                   0.0, 0.0, 0.0, 0.0, dtype=jnp.float64)
        refined, rms0, rms1 = refine_intrinsics("PINHOLE", init, pts, uv,
                                                iters=40)
        assert rms1 < 1e-4, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(refined[:4], np.asarray(true[:4]),
                                   atol=0.05)

    def test_kannala_brandt_recovery(self):
        true = equidistant.make_params(191.0, 190.9, 255.0, 257.0,
                                       0.0035, 0.0007, -0.002, 0.0002,
                                       dtype=jnp.float64)
        rng = np.random.default_rng(1)
        # Wide-angle rays for a fisheye.
        theta = rng.uniform(0.05, 1.1, 400)
        phi = rng.uniform(-np.pi, np.pi, 400)
        pts = np.stack([np.sin(theta) * np.cos(phi),
                        np.sin(theta) * np.sin(phi),
                        np.cos(theta)], -1) * rng.uniform(2, 6, 400)[:, None]
        uv = equidistant.project(true, jnp.asarray(pts))
        init = equidistant.make_params(185.0, 185.0, 250.0, 252.0,
                                       0.0, 0.0, 0.0, 0.0, dtype=jnp.float64)
        refined, rms0, rms1 = refine_intrinsics("KANNALA_BRANDT", init, pts,
                                                uv, iters=40)
        assert rms1 < 1e-3, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(refined[:4], np.asarray(true[:4]),
                                   atol=0.1)

    def test_mei_recovery(self):
        from mobile_slam_tpu.models.cameras import mei

        true = mei.make_params(0.9, 350.0, 348.0, 376.0, 240.0,
                               -0.1, 0.02, 1e-4, -1e-4, dtype=jnp.float64)
        pts = synthetic_points(seed=3)
        uv = mei.project(true, jnp.asarray(pts))
        init = mei.make_params(0.85, 340.0, 340.0, 370.0, 245.0,
                               0.0, 0.0, 0.0, 0.0, dtype=jnp.float64)
        refined, rms0, rms1 = refine_intrinsics("MEI", init, pts, uv,
                                                iters=60)
        assert rms1 < 1e-2, f"rms {rms0:.2f} -> {rms1:.2e}"

    def test_scaramuzza_recovery(self):
        """The model the round-1 factory did not cover
        (CostFunctionFactory.cc:446-470 SCARAMUZZA branch)."""
        from mobile_slam_tpu.models.cameras import scaramuzza
        from mobile_slam_tpu.models.cameras.calibration import (
            scaramuzza_flat_params)

        poly = np.array([-250.0, 0.0, 1.2e-3, 0.0, 6e-9])
        inv_poly = scaramuzza.fit_inverse_poly(poly, 360.0)
        true = scaramuzza.make_params(poly, inv_poly, (378.0, 242.0),
                                      (1.001, 1e-4, -2e-4),
                                      dtype=jnp.float64)
        rng = np.random.default_rng(4)
        theta = rng.uniform(0.1, 1.2, 400)
        phi = rng.uniform(-np.pi, np.pi, 400)
        pts = np.stack([np.sin(theta) * np.cos(phi),
                        np.sin(theta) * np.sin(phi),
                        np.cos(theta)], -1) * rng.uniform(2, 6, 400)[:, None]
        uv = scaramuzza.project(true, jnp.asarray(pts))
        assert np.all(np.isfinite(np.asarray(uv)))

        init_dict = scaramuzza.make_params(
            poly, inv_poly * rng.uniform(0.97, 1.03, len(inv_poly)),
            (372.0, 247.0), (1.0, 0.0, 0.0), dtype=jnp.float64)
        flat0 = scaramuzza_flat_params(init_dict)
        refined, rms0, rms1 = refine_intrinsics("SCARAMUZZA", flat0, pts, uv,
                                                iters=60)
        assert rms1 < 0.05, f"rms {rms0:.2f} -> {rms1:.2e}"
        q = scaramuzza.INV_POLY_SIZE
        np.testing.assert_allclose(refined[q:q + 2], [378.0, 242.0],
                                   atol=0.5)


class TestRefineExtrinsics:
    def test_pose_recovery_pinhole(self):
        from mobile_slam_tpu.models.cameras.calibration import (
            refine_extrinsics)
        from mobile_slam_tpu.utils import rotations as rot

        params = pinhole.make_params(460.0, 458.0, 376.0, 240.0,
                                     -0.28, 0.07, 1e-4, -2e-4,
                                     dtype=jnp.float64)
        rng = np.random.default_rng(5)
        wp = np.stack([rng.uniform(-2, 2, 200), rng.uniform(-2, 2, 200),
                       rng.uniform(0, 1, 200)], -1)
        th = 0.3
        q_true = np.array([np.cos(th / 2), 0.1, np.sin(th / 2), 0.05])
        q_true /= np.linalg.norm(q_true)
        t_true = np.array([0.3, -0.2, 4.0])
        pc = wp @ np.asarray(rot.quat_to_rot(jnp.asarray(q_true))).T + t_true
        uv = pinhole.project(params, jnp.asarray(pc))

        q0 = np.array([1.0, 0.0, 0.0, 0.0])
        t0 = np.array([0.0, 0.0, 3.5])
        q, t, rms0, rms1 = refine_extrinsics("PINHOLE", params, q0, t0,
                                             wp, uv, iters=40)
        assert rms1 < 1e-5, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(t, t_true, atol=1e-4)
        assert abs(abs(np.dot(q, q_true)) - 1.0) < 1e-8

    def test_pose_recovery_fisheye(self):
        from mobile_slam_tpu.models.cameras.calibration import (
            refine_extrinsics)
        from mobile_slam_tpu.utils import rotations as rot

        params = equidistant.make_params(191.0, 190.9, 255.0, 257.0,
                                         0.0035, 0.0007, -0.002, 0.0002,
                                         dtype=jnp.float64)
        rng = np.random.default_rng(6)
        theta = rng.uniform(0.05, 1.0, 200)
        phi = rng.uniform(-np.pi, np.pi, 200)
        pc_true = np.stack([np.sin(theta) * np.cos(phi),
                            np.sin(theta) * np.sin(phi),
                            np.cos(theta)], -1) * rng.uniform(2, 6, 200)[:, None]
        q_true = np.array([0.99, 0.05, -0.08, 0.03])
        q_true /= np.linalg.norm(q_true)
        t_true = np.array([-0.1, 0.15, 0.2])
        R = np.asarray(rot.quat_to_rot(jnp.asarray(q_true)))
        wp = (pc_true - t_true) @ R  # world points: pc = R wp + t
        uv = equidistant.project(params, jnp.asarray(pc_true))
        q, t, rms0, rms1 = refine_extrinsics(
            "KANNALA_BRANDT", params, np.array([1.0, 0, 0, 0]),
            np.zeros(3), wp, uv, iters=40)
        assert rms1 < 1e-5, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(t, t_true, atol=1e-4)


class TestCameraOdometryCalibration:
    def test_hand_eye_recovery_pinhole(self):
        """CAMERA_ODOMETRY_TRANSFORM | ODOMETRY_6D_POSE parity
        (CostFunctionFactory.cc:471+): recover the camera-odometry
        transform jointly with perturbed odometry poses; odometry pose 0
        pins the gauge."""
        from mobile_slam_tpu.models.cameras.calibration import (
            calibrate_camera_odometry)
        from mobile_slam_tpu.utils import rotations as rot

        params = pinhole.make_params(460.0, 458.0, 376.0, 240.0,
                                     -0.28, 0.07, 1e-4, -2e-4,
                                     dtype=jnp.float64)
        rng = np.random.default_rng(11)
        V, N = 5, 120
        # GT camera-in-odometry transform (x_o = R_oc x_c + t_oc).
        q_oc = np.array([np.cos(0.2), 0.1, np.sin(0.2), -0.05])
        q_oc /= np.linalg.norm(q_oc)
        t_oc = np.array([0.12, -0.06, 0.30])
        R_oc = np.asarray(rot.quat_to_rot(jnp.asarray(q_oc)))
        # GT odometry trajectory (world-from-odometry).
        odo_q, odo_t = [], []
        for i in range(V):
            th = 0.15 * i
            qi = np.array([np.cos(th / 2), 0.0, 0.0, np.sin(th / 2)])
            odo_q.append(qi)
            odo_t.append(np.array([0.4 * i, 0.1 * i, 0.0]))
        odo_q = np.stack(odo_q)
        odo_t = np.stack(odo_t)
        # Points generated in each view's camera frame, lifted to world.
        wps, uvs = [], []
        for i in range(V):
            pc = np.stack([rng.uniform(-1.5, 1.5, N),
                           rng.uniform(-1.0, 1.0, N),
                           rng.uniform(2.0, 6.0, N)], -1)
            R_wo = np.asarray(rot.quat_to_rot(jnp.asarray(odo_q[i])))
            xo = pc @ R_oc.T + t_oc
            wps.append(xo @ R_wo.T + odo_t[i])
            uvs.append(np.asarray(pinhole.project(params, jnp.asarray(pc))))
        wps = np.stack(wps)
        uvs = np.stack(uvs)

        # Perturb the transform and odometry poses 1..V-1 (pose 0 = gauge).
        q0 = np.asarray(rot.quat_boxplus(jnp.asarray(q_oc),
                                         jnp.asarray([0.05, -0.04, 0.06])))
        t0 = t_oc + np.array([0.05, 0.08, -0.06])
        oq0 = odo_q.copy()
        ot0 = odo_t.copy()
        for i in range(1, V):
            oq0[i] = np.asarray(rot.quat_boxplus(
                jnp.asarray(odo_q[i]),
                jnp.asarray(rng.uniform(-0.03, 0.03, 3))))
            ot0[i] = odo_t[i] + rng.uniform(-0.05, 0.05, 3)

        q_r, t_r, oq_r, ot_r, rms0, rms1 = calibrate_camera_odometry(
            "PINHOLE", params, q0, t0, oq0, ot0, wps, uvs, iters=40)
        assert rms0 > 1.0            # the perturbation was visible
        assert rms1 < 1e-4, f"rms {rms0:.2f} -> {rms1:.2e}"
        np.testing.assert_allclose(t_r, t_oc, atol=1e-3)
        assert abs(abs(np.dot(q_r, q_oc)) - 1.0) < 1e-6
        np.testing.assert_allclose(ot_r[2], odo_t[2], atol=1e-3)
