"""Parallel-prefix preintegration must match the sequential reference
recursion (and hence the C++ IntegrationBase) to numerical noise."""

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.imu import preintegration as pre

G = 9.81007


def _noise():
    return pre.make_noise_cov(0.05, 0.004, 4e-5, 2e-6, dtype=jnp.float64)


def _interval(seed=0, n=16):
    rng = np.random.default_rng(seed)
    dt = np.full(n, 0.005) * rng.uniform(0.8, 1.2, n)
    acc = rng.normal(size=(n, 3)) * 0.5 + [0.1, -0.2, G]
    gyr = rng.normal(size=(n, 3)) * 0.3
    acc0 = rng.normal(size=3) * 0.5 + [0, 0, G]
    gyr0 = rng.normal(size=3) * 0.3
    return (jnp.asarray(acc0), jnp.asarray(gyr0), jnp.asarray(dt),
            jnp.asarray(acc), jnp.asarray(gyr))


def _compare(a: pre.Preintegration, b: pre.Preintegration, tol=1e-9):
    np.testing.assert_allclose(np.asarray(a.dp), np.asarray(b.dp), atol=tol)
    qa, qb = np.asarray(a.dq), np.asarray(b.dq)
    np.testing.assert_allclose(qa * np.sign(qa[0] * qb[0] + 1e-30),
                               qb, atol=tol)
    np.testing.assert_allclose(np.asarray(a.dv), np.asarray(b.dv), atol=tol)
    np.testing.assert_allclose(np.asarray(a.jac), np.asarray(b.jac), atol=tol)
    np.testing.assert_allclose(np.asarray(a.cov), np.asarray(b.cov),
                               atol=tol * 10)
    np.testing.assert_allclose(float(a.sum_dt), float(b.sum_dt), atol=tol)


class TestParallelMatchesSequential:
    def test_full_interval(self):
        acc0, gyr0, dt, acc, gyr = _interval()
        ba = jnp.asarray([0.01, -0.02, 0.005])
        bg = jnp.asarray([0.002, 0.001, -0.003])
        n = jnp.asarray(dt.shape[0])
        seq = pre.preintegrate(acc0, gyr0, dt, acc, gyr, n, ba, bg, _noise())
        par = pre.preintegrate_parallel(acc0, gyr0, dt, acc, gyr, n, ba, bg,
                                        _noise())
        _compare(seq, par, tol=1e-7)

    def test_masked_count(self):
        acc0, gyr0, dt, acc, gyr = _interval(1)
        z = jnp.zeros(3, jnp.float64)
        for cnt in [0, 1, 7, 16]:
            seq = pre.preintegrate(acc0, gyr0, dt, acc, gyr,
                                   jnp.asarray(cnt), z, z, _noise())
            par = pre.preintegrate_parallel(acc0, gyr0, dt, acc, gyr,
                                            jnp.asarray(cnt), z, z, _noise())
            _compare(seq, par, tol=1e-7)

    def test_continue_composition(self):
        """Composing two segments must equal one sequential run over the
        concatenated stream."""
        acc0, gyr0, dt, acc, gyr = _interval(2, n=20)
        z = jnp.zeros(3, jnp.float64)
        n = 20
        k = 8
        full = pre.preintegrate(acc0, gyr0, dt, acc, gyr, jnp.asarray(n),
                                z, z, _noise())
        seg_a = pre.preintegrate_parallel(acc0, gyr0, dt[:k], acc[:k],
                                          gyr[:k], jnp.asarray(k), z, z,
                                          _noise())
        merged = pre.continue_preintegration_parallel(
            seg_a, acc[k - 1], gyr[k - 1], dt[k:], acc[k:], gyr[k:],
            jnp.asarray(n - k), _noise(),
        )
        _compare(full, merged, tol=1e-6)

    def test_propagate_parallel_matches(self):
        acc0, gyr0, dt, acc, gyr = _interval(3)
        p0 = jnp.asarray([1.0, -2.0, 0.5])
        q0 = jnp.asarray([0.9, 0.1, -0.2, 0.38])
        q0 = q0 / jnp.linalg.norm(q0)
        v0 = jnp.asarray([0.3, 0.1, -0.2])
        ba = jnp.asarray([0.01, 0.0, -0.01])
        bg = jnp.asarray([0.001, -0.002, 0.0])
        grav = jnp.asarray([0.0, 0.0, G])
        n = jnp.asarray(dt.shape[0])
        seq = pre.propagate_state(p0, q0, v0, ba, bg, acc0, gyr0, dt, acc,
                                  gyr, n, grav)
        par = pre.propagate_state_parallel(p0, q0, v0, ba, bg, acc0, gyr0,
                                           dt, acc, gyr, n, grav)
        for a, b in zip(seq[:3], par[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-9)
