"""Full square-root marginalization pipeline vs the dense (eigh) path.

The two are orthogonally-related square roots of the same marginal
information (marginalization.py SQRT_MARGIN_OLD note), so in float64 the
prior INFORMATION (J0ᵀJ0, J0ᵀr0) must agree — once the dense path's
eigen-threshold regularization (REL_EIG_EPS) is lowered to machine level,
since that truncation is the one deliberate difference between the paths.
"""

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.factors import marginalization as marg


class TestBlockLevelTruth:
    """Both elimination paths vs an extended-precision (longdouble) Schur
    reference on a controlled ill-conditioned system: proves the sqrt path
    is the *more accurate* square root of the same marginal information
    (the end-to-end parity tolerance below is set by the DENSE path's own
    cancellation noise, so this test is what pins correctness)."""

    def _system(self, n=marg.S, m=2 * marg.S, kappa=3e4, seed=3):
        # n = the production tangent size: _eliminate_frame_block hard-codes
        # the (S,) zero-mask, so the test system uses the same shape.
        rng = np.random.default_rng(seed)
        # Fresh rows: random but BLIND to the soft direction (like the live
        # window, which carries almost no monocular-scale information —
        # the prior holds ~78% of it, dev_scale_observability.py).
        u, _, vt = np.linalg.svd(rng.normal(size=(n, n)))
        soft = vt[-1]                       # the weakly-observed direction
        J_f = rng.normal(size=(m, n))
        J_f = J_f - np.outer(J_f @ soft, soft)
        r_f = rng.normal(size=m)
        # Prior rows: singular values spanning 1/kappa, softest along
        # `soft` (squaring makes kappa^2, the dense path's burden).
        s = np.geomspace(1.0, 1.0 / kappa, n)
        J_p = (u * s) @ vt * 50.0
        r_p = rng.normal(size=n) * 1e-3
        # Keep the dropped block away from the soft direction: zero its
        # components there so elimination cannot rotate the soft info.
        drop = np.arange(5, 20)
        return J_f, r_f, J_p, r_p, drop, soft

    @staticmethod
    def _inv_longdouble(a):
        """Gauss-Jordan inverse with partial pivoting (LAPACK has no
        longdouble support)."""
        n = a.shape[0]
        m = np.concatenate([a.copy(), np.eye(n, dtype=a.dtype)], axis=1)
        for k in range(n):
            piv = k + np.argmax(np.abs(m[k:, k]))
            m[[k, piv]] = m[[piv, k]]
            m[k] = m[k] / m[k, k]
            for i in range(n):
                if i != k:
                    m[i] = m[i] - m[i, k] * m[k]
        return m[:, n:]

    def _truth(self, J_f, r_f, J_p, r_p, drop):
        L = np.longdouble
        J = np.concatenate([J_f, J_p]).astype(L)
        r = np.concatenate([r_f, r_p]).astype(L)
        H = J.T @ J
        g = J.T @ r
        n = H.shape[0]
        keep = np.setdiff1d(np.arange(n), drop)
        Hmm = H[np.ix_(drop, drop)]
        Hkm = H[np.ix_(keep, drop)]
        Hmm_inv = self._inv_longdouble(Hmm)
        H2 = np.zeros_like(H)
        g2 = np.zeros_like(g)
        H2[np.ix_(keep, keep)] = (H[np.ix_(keep, keep)]
                                  - Hkm @ Hmm_inv @ Hkm.T)
        g2[keep] = g[keep] - Hkm @ (Hmm_inv @ g[drop])
        return np.asarray(H2, np.float64), np.asarray(g2, np.float64)

    def test_sqrt_path_beats_dense_path(self):
        J_f, r_f, J_p, r_p, drop, soft = self._system()
        H_t, g_t = self._truth(J_f, r_f, J_p, r_p, drop)
        n = J_p.shape[0]
        f32 = jnp.float32

        # Dense-style f32 path: form H = JᵀJ (squares the prior), Schur via
        # the production pseudo-inverse block elimination.
        J = np.concatenate([J_f, J_p])
        r = np.concatenate([r_f, r_p])
        H = jnp.asarray((J.T @ J), f32)
        g = jnp.asarray(J.T @ r, f32)
        H_d, g_d = marg._eliminate_frame_block(H, g, jnp.asarray(drop))

        # Sqrt-style f32 path: Householder-eliminate the dropped columns on
        # the stacked raw rows, then QR-recompress.
        M = jnp.asarray(
            np.concatenate([np.concatenate([J_f, r_f[:, None]], axis=1),
                            np.concatenate([J_p, r_p[:, None]], axis=1)]),
            f32)
        M = marg._householder_eliminate(M, list(drop))
        zc = jnp.ones((n,), f32).at[jnp.asarray(drop)].set(0.0)
        M = M.at[:, :n].multiply(zc[None, :])
        R = jnp.linalg.qr(M, mode="r")
        J0s = np.asarray(R[:n, :n], np.float64)
        r0s = np.asarray(R[:n, n], np.float64)
        H_s = J0s.T @ J0s
        g_s = J0s.T @ r0s

        # Bulk accuracy: both paths must track the longdouble truth at the
        # f32 noise floor overall...
        scale = np.abs(H_t).max()
        err_d = np.abs(np.asarray(H_d, np.float64) - H_t).max() / scale
        err_s = np.abs(H_s - H_t).max() / scale
        assert err_s < 1e-4, f"sqrt path bulk error {err_s:.2e}"
        assert err_d < 1e-2, f"dense path bulk error {err_d:.2e}"
        # ...but along the SOFT direction (curvature 1/kappa^2 below the
        # spectrum top — the monocular-scale analog) the dense path has
        # squared away the signal while the sqrt path retains it. This is
        # the production failure mode measured by dev_scale_observability
        # (dense soft-direction error 60x vs QR 5e-6).
        c_t = float(soft @ H_t @ soft)
        c_d = float(soft @ np.asarray(H_d, np.float64) @ soft)
        c_s = float(soft @ H_s @ soft)
        rel_d = abs(c_d - c_t) / c_t
        rel_s = abs(c_s - c_t) / c_t
        assert rel_s < 0.05, f"sqrt soft-direction error {rel_s:.2e}"
        assert rel_s < 0.1 * max(rel_d, 1e-12), (
            f"sqrt {rel_s:.2e} not clearly better than dense {rel_d:.2e}")


def _prior_after_step(state, params, is_kf):
    state2, p, q, diag = est.solve_and_slide(
        state, jnp.asarray(is_kf), params, 4)
    pr = state2.prior
    J0 = np.asarray(pr.J0)
    r0 = np.asarray(pr.r0)
    return J0.T @ J0, J0.T @ r0, bool(diag.state_finite)


def _run_parity_checks():
    """Engine-level checks, executed in a SUBPROCESS by the pytest wrapper
    below: after ~1000 in-process XLA:CPU compilations (a full suite run)
    the compiler segfaults on these graphs — twice reproduced at this exact
    test, never standalone — so they get a fresh process like the sharding
    tests (see tests/test_parallel.py)."""
    cfg = tiny_config(max_features=48, num_iterations=4)
    params = est.make_params(cfg, jnp.float64)
    state0, inp = make_example_state(cfg, params, jnp.float64)
    state0, _ = est.bookkeeping_step(state0, inp, params)

    for is_kf, tag in ((True, "old"), (False, "new")):
        # Machine-level eigen threshold so dense drops nothing the sqrt
        # path keeps (the threshold is the paths' one designed difference).
        marg.REL_EIG_EPS = 1e-13
        marg.enable_sqrt_pipeline(False)
        H_d, g_d, ok_d = _prior_after_step(state0, params, is_kf)
        marg.enable_sqrt_pipeline(True)
        H_s, g_s, ok_s = _prior_after_step(state0, params, is_kf)
        assert ok_d and ok_s
        # Tolerance is set by the DENSE path's own noise floor: its Schur
        # complement cancels ~κ(J0)² ≈ 1e9-conditioned products, so even in
        # f64 its result carries ~1e-4 relative noise (measured; the
        # longdouble block test above shows the sqrt path is the accurate
        # one). Agreement at that floor is the strongest statement the
        # dense path can support.
        scale = np.abs(H_d).max()
        np.testing.assert_allclose(H_s, H_d, atol=2e-3 * scale)
        gscale = max(np.abs(g_d).max(), 1e-12)
        np.testing.assert_allclose(g_s, g_d, atol=2e-3 * gscale)
        print(f"PARITY_OK {tag}", flush=True)

    # Multi-frame health with the full sqrt pipeline at the production
    # eigen threshold: state and prior stay finite.
    marg.REL_EIG_EPS = 1e-4
    marg.enable_sqrt_pipeline(True)
    state = state0
    for k in range(4):
        state, p, q, diag = est.solve_and_slide(
            state, jnp.asarray(k % 2 == 0), params, 4)
        assert bool(diag.state_finite), f"non-finite at step {k}"
    assert bool(jnp.all(jnp.isfinite(state.prior.J0)))
    assert bool(jnp.all(jnp.isfinite(state.prior.r0)))
    print("HEALTH_OK", flush=True)


class TestSqrtPipelineParity:
    def test_parity_and_health_subprocess(self):
        import os
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, PYTHONPATH=repo)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], cwd=repo, env=env,
            capture_output=True, text=True, timeout=1500,
        )
        assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
        assert "PARITY_OK old" in out.stdout
        assert "PARITY_OK new" in out.stdout
        assert "HEALTH_OK" in out.stdout


if __name__ == "__main__":
    # Subprocess entry: conftest.py does not apply here, so force the CPU
    # backend (the axon TPU plugin ignores JAX_PLATFORMS) and f64 before
    # any computation.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    _run_parity_checks()
