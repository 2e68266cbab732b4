"""Tier-1 unit tests for the factor modules, in float64.

Direct analogs of the reference's factor-level validators:
  * IMUFactor whitening sqrt_info = LLT(cov^-1).matrixL().T
    (include/backend/factor/imu_factor.h:37-40),
  * ProjectionFactor::check finite-difference Jacobian validation
    (src/backend/factor/projection_factor.cpp:87-173),
  * FailureDetector thresholds (src/frontend/failure_detector.cpp:15-45).

The solver consumes these factors through autodiff (solver/assembly.py), so
the FD checks here validate the *residual implementations* the same way the
reference validates its hand-derived Jacobians.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobile_slam_tpu.factors import imu_factor, projection
from mobile_slam_tpu.imu import preintegration as preint
from mobile_slam_tpu.utils import rotations as rot

RNG = np.random.default_rng(42)


def _rand_quat(rng=RNG):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    return jnp.asarray(q)


def _make_pre(rng=RNG, m=12, ba=(0.02, -0.01, 0.015), bg=(0.004, -0.002, 0.001)):
    """Preintegrate a short interval of structured (non-trivial) IMU data."""
    dt = jnp.full((m,), 0.005)
    t = np.arange(m) * 0.005
    acc = jnp.asarray(np.stack([
        0.4 * np.sin(3 * t), 0.2 * np.cos(5 * t), 9.81 + 0.1 * t], -1))
    gyr = jnp.asarray(np.stack([
        0.3 * np.cos(2 * t), -0.2 * np.sin(4 * t), 0.15 + 0.05 * t], -1))
    noise = preint.make_noise_cov(0.08, 0.004, 2e-4, 2e-5, jnp.float64)
    ba = jnp.asarray(ba)
    bg = jnp.asarray(bg)
    return preint.preintegrate(acc[0], gyr[0], dt, acc, gyr,
                               jnp.asarray(m), ba, bg, noise)


class TestSqrtInfo:
    def test_whitening_identity(self):
        """W^T W == cov^-1 for a covariance spanning wide diagonal scales
        (the 15x15 preintegration covariance spans ~9 orders)."""
        n = 15
        a = RNG.normal(size=(n, n))
        scales = 10.0 ** RNG.uniform(-5, 3, size=n)
        cov = a @ a.T + n * np.eye(n)
        cov = cov * np.outer(scales, scales)
        w = imu_factor.sqrt_info_from_cov(jnp.asarray(cov))
        lhs = np.asarray(w.T @ w)
        rhs = np.linalg.inv(cov)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-6, atol=1e-9 * np.abs(rhs).max())

    def test_real_preintegration_cov(self):
        """Whitening of an actual propagated covariance is finite and
        consistent: ||W r||^2 == r^T cov^-1 r."""
        pre = _make_pre()
        w = imu_factor.sqrt_info_from_cov(pre.cov)
        assert bool(jnp.all(jnp.isfinite(w)))
        r = jnp.asarray(RNG.normal(size=15))
        lhs = float(jnp.sum((w @ r) ** 2))
        rhs = float(r @ jnp.linalg.solve(pre.cov, r))
        assert lhs == pytest.approx(rhs, rel=1e-5)


class TestIMUFactor:
    def _consistent_states(self, pre, gravity):
        """States (i, j) that satisfy the preintegration exactly:
        the residual formula inverted at zero (integration_base.h:162-191)."""
        p_i = jnp.asarray([0.3, -0.2, 1.1])
        q_i = _rand_quat()
        v_i = jnp.asarray([0.5, 0.1, -0.3])
        t = pre.sum_dt
        r_i = rot.quat_to_rot(q_i)
        p_j = p_i + v_i * t - 0.5 * gravity * t * t + r_i @ pre.dp
        v_j = v_i - gravity * t + r_i @ pre.dv
        q_j = rot.quat_mul(q_i, pre.dq)
        return (p_i, q_i, v_i, pre.lin_ba, pre.lin_bg,
                p_j, q_j, v_j, pre.lin_ba, pre.lin_bg)

    def test_zero_residual_on_consistent_states(self):
        pre = _make_pre()
        gravity = jnp.asarray([0.0, 0.0, 9.81])
        states = self._consistent_states(pre, gravity)
        sqrt_info = imu_factor.sqrt_info_from_cov(pre.cov)
        r = imu_factor.whitened_residual(pre, *states, gravity, sqrt_info)
        # Whitened scale is huge (bias chains ~1e7), so compare the raw
        # residual: machine-zero in f64.
        raw = preint.evaluate(pre, *states, gravity)
        np.testing.assert_allclose(np.asarray(raw), 0.0, atol=1e-12)
        assert bool(jnp.all(jnp.isfinite(r)))

    def test_bias_correction_first_order(self):
        """evaluate() with perturbed ba_i/bg_i uses the first-order bias
        Jacobian: residual of (repropagated-at-new-bias) vs (corrected)
        agrees to O(||db||^2) (IntegrationBase::evaluate vs repropagate)."""
        ba0 = jnp.asarray([0.02, -0.01, 0.015])
        bg0 = jnp.asarray([0.004, -0.002, 0.001])
        db = 1e-4
        pre = _make_pre(ba=tuple(np.asarray(ba0)), bg=tuple(np.asarray(bg0)))
        pre2 = _make_pre(ba=tuple(np.asarray(ba0) + db),
                         bg=tuple(np.asarray(bg0) - db))
        gravity = jnp.asarray([0.0, 0.0, 9.81])
        # States consistent with the REPROPAGATED preintegration: the
        # first-order-corrected factor at (ba0+db, bg0-db) must be ~0.
        states = TestIMUFactor()._consistent_states(pre2, gravity)
        raw = preint.evaluate(pre, *states, gravity)
        assert float(jnp.max(jnp.abs(raw))) < 5e-7  # O(db^2) = 1e-8 scale

    def test_jacobian_matches_finite_differences(self):
        """jacfwd through the manifold perturbation == central differences
        (the check() the reference runs for ProjectionFactor, applied to the
        IMU factor; projection_factor.cpp:87-173)."""
        pre = _make_pre()
        gravity = jnp.asarray([0.0, 0.0, 9.81])
        base = self._consistent_states(pre, gravity)
        # Shift states off the zero-residual point so the Jacobian is generic.
        base = (base[0] + 0.03, rot.quat_boxplus(base[1], jnp.asarray([0.02, -0.01, 0.03])),
                base[2] - 0.05, base[3] + 0.002, base[4] - 0.001,
                base[5] - 0.02, base[6], base[7] + 0.04, base[8], base[9])

        def f(delta):
            d = delta.reshape(2, 15)
            p_i = base[0] + d[0, 0:3]
            q_i = rot.quat_boxplus(base[1], d[0, 3:6])
            v_i = base[2] + d[0, 6:9]
            ba_i = base[3] + d[0, 9:12]
            bg_i = base[4] + d[0, 12:15]
            p_j = base[5] + d[1, 0:3]
            q_j = rot.quat_boxplus(base[6], d[1, 3:6])
            v_j = base[7] + d[1, 6:9]
            ba_j = base[8] + d[1, 9:12]
            bg_j = base[9] + d[1, 12:15]
            return preint.evaluate(pre, p_i, q_i, v_i, ba_i, bg_i,
                                   p_j, q_j, v_j, ba_j, bg_j, gravity)

        zero = jnp.zeros(30)
        jac_ad = np.asarray(jax.jacfwd(f)(zero))
        h = 1e-6
        jac_fd = np.zeros_like(jac_ad)
        for k in range(30):
            e = np.zeros(30)
            e[k] = h
            jac_fd[:, k] = (np.asarray(f(jnp.asarray(e)))
                            - np.asarray(f(jnp.asarray(-e)))) / (2 * h)
        scale = np.abs(jac_ad).max()
        np.testing.assert_allclose(jac_ad, jac_fd, atol=5e-6 * scale)


class TestProjectionFactor:
    def _setup(self):
        t_ic = jnp.asarray([0.05, 0.07, -0.04])
        q_ic = _rand_quat()
        p_i = jnp.asarray([0.1, -0.3, 0.2])
        q_i = _rand_quat()
        p_j = jnp.asarray([0.4, 0.0, 0.15])
        q_j = _rand_quat()
        x_w = jnp.asarray([0.8, -0.5, 4.0])

        def cam_point(p_b, q_b):
            x_imu = rot.quat_rotate(rot.quat_conjugate(q_b), x_w - p_b)
            return rot.quat_rotate(rot.quat_conjugate(q_ic), x_imu - t_ic)

        c_i = cam_point(p_i, q_i)
        c_j = cam_point(p_j, q_j)
        ray_i = c_i / c_i[2]
        ray_j = c_j / c_j[2]
        inv_dep = 1.0 / c_i[2]
        return (ray_i, ray_j, inv_dep, p_i, q_i, p_j, q_j, t_ic, q_ic)

    def test_zero_residual_perfect_geometry(self):
        (ray_i, ray_j, inv_dep, p_i, q_i, p_j, q_j, t_ic, q_ic) = self._setup()
        r = projection.residual(ray_i, ray_j, inv_dep, p_i, q_i, p_j, q_j,
                                t_ic, q_ic, jnp.asarray(460.0 / 1.5))
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-10)

    def test_jacobian_matches_finite_differences(self):
        """ProjectionFactor::check parity: AD Jacobian == central FD over
        the 13-dim perturbation (pose_i 6, pose_j 6, inv_depth 1)."""
        (ray_i, ray_j, inv_dep, p_i, q_i, p_j, q_j, t_ic, q_ic) = self._setup()
        # Perturb the observation so the residual is nonzero (generic point).
        ray_j = ray_j + jnp.asarray([5e-3, -3e-3, 0.0])

        def f(delta):
            return projection.residual(
                ray_i, ray_j, inv_dep + delta[12],
                p_i + delta[0:3], rot.quat_boxplus(q_i, delta[3:6]),
                p_j + delta[6:9], rot.quat_boxplus(q_j, delta[9:12]),
                t_ic, q_ic, jnp.asarray(460.0 / 1.5))

        zero = jnp.zeros(13)
        jac_ad = np.asarray(jax.jacfwd(f)(zero))
        h = 1e-7
        jac_fd = np.zeros_like(jac_ad)
        for k in range(13):
            e = np.zeros(13)
            e[k] = h
            jac_fd[:, k] = (np.asarray(f(jnp.asarray(e)))
                            - np.asarray(f(jnp.asarray(-e)))) / (2 * h)
        scale = np.abs(jac_ad).max()
        np.testing.assert_allclose(jac_ad, jac_fd, atol=1e-6 * scale)

    def test_cauchy_weight(self):
        """IRLS weight: 1 at r=0, sqrt(1/(1+s)) in general
        (CauchyLoss(1.0), optimizer.cpp:106)."""
        assert float(projection.cauchy_weight(jnp.zeros(2))) == pytest.approx(1.0)
        r = jnp.asarray([3.0, 4.0])  # s = 25
        assert float(projection.cauchy_weight(r)) == pytest.approx(
            np.sqrt(1 / 26), rel=1e-6)
        # Monotone nonincreasing in |r|.
        ws = [float(projection.cauchy_weight(jnp.asarray([x, 0.0])))
              for x in np.linspace(0, 10, 20)]
        assert all(a >= b - 1e-12 for a, b in zip(ws, ws[1:]))


class TestFailureDetector:
    def _state(self):
        from mobile_slam_tpu.frontend import failure_detector as fd
        from mobile_slam_tpu.models import state as st
        w = st.init_window(max_imu=8, dtype=jnp.float64)
        t = st.init_feature_table(16, dtype=jnp.float64)
        return fd, w, t

    def test_nominal_state_passes(self):
        fd, w, t = self._state()
        rep = fd.detect_failure(w, t, w.p[-1], w.q[-1])
        assert not bool(rep.failed)

    def test_each_threshold_fires(self):
        fd, w, t = self._state()
        tip = -1
        # Accel bias beyond 2.5 (failure_detector.cpp BA threshold).
        w2 = w._replace(ba=w.ba.at[tip].set(jnp.asarray([3.0, 0, 0])))
        assert bool(fd.detect_failure(w2, t, w.p[tip], w.q[tip]).big_acc_bias)
        # Gyro bias beyond 1.0.
        w2 = w._replace(bg=w.bg.at[tip].set(jnp.asarray([0, 1.5, 0])))
        assert bool(fd.detect_failure(w2, t, w.p[tip], w.q[tip]).big_gyr_bias)
        # Position jump > 5 m.
        w2 = w._replace(p=w.p.at[tip].set(jnp.asarray([6.0, 0, 0])))
        rep = fd.detect_failure(w2, t, w.p[tip] * 0, w.q[tip])
        assert bool(rep.big_translation)
        # Vertical jump > 1 m.
        w2 = w._replace(p=w.p.at[tip].set(jnp.asarray([0, 0, 1.5])))
        rep = fd.detect_failure(w2, t, w.p[tip] * 0, w.q[tip])
        assert bool(rep.big_z) and not bool(rep.big_translation)
        # Rotation jump > 50 deg.
        q_rot = rot.quat_boxplus(w.q[tip], jnp.asarray([0.0, 0.0, 1.2]))
        w2 = w._replace(q=w.q.at[tip].set(q_rot))
        assert bool(fd.detect_failure(w2, t, w.p[tip], w.q[tip]).big_rotation)
