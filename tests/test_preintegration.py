"""IMU preintegration tests — mirrors the reference's tier-1 math tests
(tests/test_integration_base.cpp) plus stronger analytic-trajectory checks."""

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.imu import preintegration as pre
from mobile_slam_tpu.utils import rotations as rot

ACC_N, GYR_N, ACC_W, GYR_W = 0.08, 0.004, 4e-5, 2e-6
G = 9.81007
GRAV = jnp.asarray([0.0, 0.0, G])


def noise64():
    return pre.make_noise_cov(ACC_N, GYR_N, ACC_W, GYR_W, dtype=jnp.float64)


PAD = 32  # single compiled shape for all short-interval tests


def run_preint(dt, acc, gyr, ba=None, bg=None, acc0=None, gyr0=None):
    n = len(dt)
    if n <= PAD:
        # Pad to one fixed shape with count-masking so the scan compiles once
        # for the whole module (each distinct M costs a fresh ~30s XLA:CPU
        # compile on this host).
        dt = np.concatenate([dt, np.zeros(PAD - n)])
        acc = np.concatenate([acc, np.zeros((PAD - n, 3))])
        gyr = np.concatenate([gyr, np.zeros((PAD - n, 3))])
    dt = jnp.asarray(dt, dtype=jnp.float64)
    acc = jnp.asarray(acc, dtype=jnp.float64)
    gyr = jnp.asarray(gyr, dtype=jnp.float64)
    ba = jnp.zeros(3, jnp.float64) if ba is None else jnp.asarray(ba, jnp.float64)
    bg = jnp.zeros(3, jnp.float64) if bg is None else jnp.asarray(bg, jnp.float64)
    acc0 = acc[0] if acc0 is None else jnp.asarray(acc0, jnp.float64)
    gyr0 = gyr[0] if gyr0 is None else jnp.asarray(gyr0, jnp.float64)
    return _jit_preint(acc0, gyr0, dt, acc, gyr, jnp.asarray(n), ba, bg)


@jax.jit
def _jit_preint(acc0, gyr0, dt, acc, gyr, n, ba, bg):
    return pre.preintegrate(acc0, gyr0, dt, acc, gyr, n, ba, bg, noise64())


class TestBasics:
    def test_identity_preintegration(self):
        """Constructor zeroing (test_integration_base.cpp:constructor test)."""
        p = pre.identity_preintegration(jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64))
        np.testing.assert_allclose(np.asarray(p.dp), 0.0)
        np.testing.assert_allclose(np.asarray(p.dq), [1, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(p.jac), np.eye(15))
        np.testing.assert_allclose(np.asarray(p.cov), 0.0)

    def test_gravity_integration(self):
        """Stationary IMU measuring +g: delta_v.z ≈ g·t, delta_p.z ≈ g·t²/2
        (test_integration_base.cpp gravity test)."""
        n, dt = 20, 0.005
        acc = np.tile([0.0, 0.0, G], (n, 1))
        gyr = np.zeros((n, 3))
        p = run_preint(np.full(n, dt), acc, gyr)
        t = n * dt
        np.testing.assert_allclose(float(p.sum_dt), t, atol=1e-12)
        np.testing.assert_allclose(np.asarray(p.dv), [0, 0, G * t], atol=1e-9)
        np.testing.assert_allclose(np.asarray(p.dp), [0, 0, 0.5 * G * t * t], atol=1e-9)
        np.testing.assert_allclose(np.asarray(p.dq), [1, 0, 0, 0], atol=1e-12)

    def test_count_mask_truncates(self):
        n = 16
        rng = np.random.default_rng(0)
        dt = np.full(n, 0.005)
        acc = rng.normal(size=(n, 3))
        gyr = rng.normal(size=(n, 3)) * 0.1
        full = pre.preintegrate(
            jnp.asarray(acc[0]), jnp.asarray(gyr[0]),
            jnp.asarray(dt), jnp.asarray(acc), jnp.asarray(gyr),
            jnp.asarray(8), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            noise64(),
        )
        trunc = run_preint(dt[:8], acc[:8], gyr[:8])
        np.testing.assert_allclose(np.asarray(full.dp), np.asarray(trunc.dp), atol=1e-12)
        np.testing.assert_allclose(np.asarray(full.cov), np.asarray(trunc.cov), atol=1e-12)
        np.testing.assert_allclose(float(full.sum_dt), float(trunc.sum_dt), atol=1e-12)

    def test_repropagate_idempotent(self):
        """Re-running with unchanged biases reproduces the same result
        (test_integration_base.cpp repropagate test)."""
        rng = np.random.default_rng(1)
        n = 24
        dt = np.full(n, 0.005)
        acc = rng.normal(size=(n, 3)) + [0, 0, G]
        gyr = rng.normal(size=(n, 3)) * 0.2
        a = run_preint(dt, acc, gyr)
        b = run_preint(dt, acc, gyr)  # same biases -> identical
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


class TestJacobianAndCovariance:
    def _random_interval(self, seed=2, n=24):
        rng = np.random.default_rng(seed)
        dt = np.full(n, 0.005)
        acc = rng.normal(size=(n, 3)) * 0.5 + [0.1, -0.2, G]
        gyr = rng.normal(size=(n, 3)) * 0.3
        return dt, acc, gyr

    def test_bias_jacobian_matches_finite_difference(self):
        """The accumulated 15x15 bias Jacobian must predict the change of
        (Δp, Δθ, Δv) under bias perturbation — the same check as the
        reference's (disabled) checkJacobian."""
        dt, acc, gyr = self._random_interval()
        base = run_preint(dt, acc, gyr)
        eps = 1e-6
        for b_idx, name in [(0, "ba"), (1, "bg")]:
            for k in range(3):
                dba = np.zeros(3)
                dbg = np.zeros(3)
                (dba if b_idx == 0 else dbg)[k] = eps
                pert = run_preint(dt, acc, gyr, ba=dba, bg=dbg)
                d_dp = (np.asarray(pert.dp) - np.asarray(base.dp)) / eps
                d_dv = (np.asarray(pert.dv) - np.asarray(base.dv)) / eps
                d_th = np.asarray(
                    rot.quat_boxminus(pert.dq, base.dq)
                ) / eps
                col = (9 if b_idx == 0 else 12) + k
                J = np.asarray(base.jac)
                np.testing.assert_allclose(d_dp, J[0:3, col], atol=2e-3,
                                           err_msg=f"dp/d{name}{k}")
                np.testing.assert_allclose(d_th, J[3:6, col], atol=2e-3,
                                           err_msg=f"dth/d{name}{k}")
                np.testing.assert_allclose(d_dv, J[6:9, col], atol=2e-3,
                                           err_msg=f"dv/d{name}{k}")

    def test_covariance_psd_and_monotone(self):
        dt, acc, gyr = self._random_interval(3)
        p_short = run_preint(dt[:8], acc[:8], gyr[:8])
        p_long = run_preint(dt, acc, gyr)
        for p in [p_short, p_long]:
            w = np.linalg.eigvalsh(np.asarray(p.cov))
            assert w.min() > -1e-15
        assert np.trace(np.asarray(p_long.cov)) > np.trace(np.asarray(p_short.cov))


def make_trajectory(t):
    """Analytic smooth trajectory: position + orientation with known IMU."""
    p = np.stack([np.sin(t), 0.5 * np.cos(2 * t) - 0.5, 0.1 * t], axis=-1)
    ang = 0.3 * np.sin(t)
    # Yaw-only rotation for simple closed forms.
    qs = np.stack([np.cos(ang / 2), 0 * t, 0 * t, np.sin(ang / 2)], axis=-1)
    return p, qs


class TestAnalyticTrajectory:
    def test_evaluate_zero_residual_on_perfect_imu(self):
        """Generate perfect IMU from an analytic trajectory; the
        preintegration residual between two true states must vanish."""
        rate = 1000.0
        T = 0.5
        n = int(T * rate)
        ts = np.arange(n + 1) / rate
        p, q = make_trajectory(ts)

        # Numeric world accel / body rates from the analytic trajectory.
        v = np.gradient(p, ts, axis=0)
        a_w = np.gradient(v, ts, axis=0)
        ang = 0.3 * np.sin(ts)
        dang = 0.3 * np.cos(ts)
        gyr_b = np.stack([0 * ts, 0 * ts, dang], axis=-1)  # yaw-only: ω_body = ω_world ẑ

        g = np.array([0, 0, G])
        acc_b = np.einsum(
            "nij,nj->ni",
            np.transpose(np.asarray(rot.quat_to_rot(jnp.asarray(q))), (0, 2, 1)),
            a_w + g,
        )

        dt = np.diff(ts)
        preint = pre.preintegrate(
            jnp.asarray(acc_b[0]), jnp.asarray(gyr_b[0]),
            jnp.asarray(dt), jnp.asarray(acc_b[1:]), jnp.asarray(gyr_b[1:]),
            jnp.asarray(n), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            noise64(),
        )
        res = pre.evaluate(
            preint,
            jnp.asarray(p[0]), jnp.asarray(q[0]), jnp.asarray(v[0]),
            jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            jnp.asarray(p[-1]), jnp.asarray(q[-1]), jnp.asarray(v[-1]),
            jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            jnp.asarray(g),
        )
        # Numeric-derivative + midpoint integration error budget.
        assert np.abs(np.asarray(res)).max() < 2e-4

    def test_propagate_state_tracks_trajectory(self):
        rate = 1000.0
        T = 0.5
        n = int(T * rate)
        ts = np.arange(n + 1) / rate
        p, q = make_trajectory(ts)
        v = np.gradient(p, ts, axis=0)
        a_w = np.gradient(v, ts, axis=0)
        dang = 0.3 * np.cos(ts)
        gyr_b = np.stack([0 * ts, 0 * ts, dang], axis=-1)
        g = np.array([0, 0, G])
        acc_b = np.einsum(
            "nij,nj->ni",
            np.transpose(np.asarray(rot.quat_to_rot(jnp.asarray(q))), (0, 2, 1)),
            a_w + g,
        )
        dt = np.diff(ts)
        p_end, q_end, v_end, _, _ = pre.propagate_state(
            jnp.asarray(p[0]), jnp.asarray(q[0]), jnp.asarray(v[0]),
            jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            jnp.asarray(acc_b[0]), jnp.asarray(gyr_b[0]),
            jnp.asarray(dt), jnp.asarray(acc_b[1:]), jnp.asarray(gyr_b[1:]),
            jnp.asarray(n), jnp.asarray(g),
        )
        assert np.linalg.norm(np.asarray(p_end) - p[-1]) < 1e-3
        assert np.linalg.norm(np.asarray(v_end) - v[-1]) < 1e-3
        dq = np.asarray(rot.quat_boxminus(q_end, jnp.asarray(q[-1])))
        assert np.linalg.norm(dq) < 1e-4


class TestJitAndBatch:
    def test_jit_and_float32(self):
        rng = np.random.default_rng(5)
        n = 32
        dt = jnp.full((n,), 0.005, jnp.float32)
        acc = jnp.asarray(rng.normal(size=(n, 3)) + [0, 0, G], jnp.float32)
        gyr = jnp.asarray(rng.normal(size=(n, 3)) * 0.1, jnp.float32)
        noise = pre.make_noise_cov(ACC_N, GYR_N, ACC_W, GYR_W, dtype=jnp.float32)
        f = jax.jit(pre.preintegrate)
        out = f(acc[0], gyr[0], dt, acc, gyr, jnp.asarray(n),
                jnp.zeros(3, jnp.float32), jnp.zeros(3, jnp.float32), noise)
        assert out.dp.dtype == jnp.float32
        ref = pre.preintegrate(
            acc[0].astype(jnp.float64), gyr[0].astype(jnp.float64),
            dt.astype(jnp.float64), acc.astype(jnp.float64), gyr.astype(jnp.float64),
            jnp.asarray(n), jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64),
            noise64(),
        )
        np.testing.assert_allclose(np.asarray(out.dp), np.asarray(ref.dp), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.dv), np.asarray(ref.dv), atol=1e-4)

    def test_vmap_over_window(self):
        rng = np.random.default_rng(6)
        W, n = 11, 16
        dt = jnp.full((W, n), 0.005, jnp.float64)
        acc = jnp.asarray(rng.normal(size=(W, n, 3)) + [0, 0, G])
        gyr = jnp.asarray(rng.normal(size=(W, n, 3)) * 0.1)
        counts = jnp.asarray([n] * W)
        zeros = jnp.zeros((W, 3), jnp.float64)
        out = jax.vmap(
            lambda a0, g0, d, a, g, c, ba, bg: pre.preintegrate(
                a0, g0, d, a, g, c, ba, bg, noise64()
            )
        )(acc[:, 0], gyr[:, 0], dt, acc, gyr, counts, zeros, zeros)
        assert out.dp.shape == (W, 3)
        assert out.cov.shape == (W, 15, 15)
