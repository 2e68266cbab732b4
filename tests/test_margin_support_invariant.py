"""Prior support invariant under margin-old / margin-new composition.

VERDICT r2 weak #9 / ROUND2 lead (a): the one un-root-caused numerics
question was whether the restricted-support factorization's static support
set {poses 0..W-2, speedbias 0, extrinsic} (marginalization._SUPPORT) is
COMPLETE for the margin-new replay — i.e. whether any sequence of
marginalization steps can ever leak prior information onto tangent columns
outside that set (if it could, the restricted eigen-factorization would
silently drop real information, which was one hypothesis for the
restricted-arm ATE tail).

Structural argument (pinned empirically here, in float64):
* margin-old assembles {previous prior, first IMU factor, frame-0-anchored
  projections}. The IMU factor touches {pose0, sb0, pose1, sb1}; the
  projections touch {pose0, pose_j, ex, depths}; the prior (inductively)
  touches SUPPORT. After Schur-eliminating frame-0's 15-dim block and the
  anchored depths, the survivors are {poses 1..W-1, sb1, ex}, which the
  slide permutation relabels to {poses 0..W-2, sb0, ex} = SUPPORT.
* margin-new eliminates pose[W-2] FROM THE PRIOR ALONE and relabels — it
  only shrinks the support.
So support ⊆ SUPPORT is invariant under any kf/non-kf sequence, and the
restricted factorization loses nothing. The remaining (explained) effect is
f32 ROUNDING along the soft monocular-scale direction — why the full
square-root pipeline is the default (marginalization.py SQRT_MARGIN_OLD).

These tests run the REAL marginalization ops (both the sqrt pipeline and
the dense-eigh path) over randomized 40-step kf/non-kf sequences and assert
the invariant after every step, plus f64 restricted-vs-dense factorization
equivalence on the resulting priors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.engine.example import make_example_state, tiny_config
from mobile_slam_tpu.factors import marginalization as mrg
from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov
from mobile_slam_tpu.solver import layout
from mobile_slam_tpu.solver.assembly import XState

W = NUM_SLOTS
S = layout.S

SUPPORT_MASK = np.zeros(S, bool)
SUPPORT_MASK[mrg._SUPPORT] = True


def _setup(seed=0):
    cfg = tiny_config()
    params = est.make_params(cfg, jnp.float64)
    state, _ = make_example_state(cfg, params, jnp.float64, seed=seed)
    rng = np.random.default_rng(seed)
    # Anchor variety: real tables anchor landmarks at many frames, not 0.
    table = state.table
    n = table.fid.shape[0]
    starts = rng.integers(0, W - 2, n).astype(np.int32)
    starts[: n // 3] = 0          # keep a third anchored at frame 0
    table = table._replace(start=jnp.asarray(starts))
    state = state._replace(table=table)
    w = state.window
    x = XState(p=w.p, q=w.q, v=w.v, ba=w.ba, bg=w.bg,
               lam=jnp.ones(n, jnp.float64) / 5.0,
               td=jnp.asarray(0.0, jnp.float64))
    sqrt_i = sqrt_info_from_cov(w.pre.cov[1:])
    sp = est.solver_params(params)
    return state, x, sqrt_i, sp, params, rng


def _run_sequence(sqrt_pipeline: bool, seed: int = 0, steps: int = 40):
    state, x, sqrt_i, sp, params, rng = _setup(seed)
    old_flags = (mrg.SQRT_MARGIN_OLD, mrg.SQRT_MARGIN_NEW)
    mrg.enable_sqrt_pipeline(sqrt_pipeline)
    try:
        prior = state.prior
        priors = []
        for k in range(steps):
            is_kf = bool(rng.random() < 0.35)   # margin-new dominant (20fps)
            if is_kf:
                prior = mrg.marginalize_old(
                    x, state.table, state.window, sqrt_i, prior,
                    params.ex_t, params.ex_q, sp)
            else:
                prior = mrg.marginalize_new(x, prior, params.ex_t,
                                            params.ex_q)
            priors.append((k, is_kf, prior))
        return priors
    finally:
        mrg.enable_sqrt_pipeline(old_flags[0])
        mrg.SQRT_MARGIN_NEW = old_flags[1]


def _assert_support(J0, r0, tag):
    J = np.asarray(J0)
    scale = max(np.abs(J).max(), 1e-30)
    off = np.abs(J[:, ~SUPPORT_MASK]).max() if (~SUPPORT_MASK).any() else 0.0
    assert off <= 1e-10 * scale, (
        f"{tag}: prior leaked outside SUPPORT: off={off:.3e} scale={scale:.3e}")
    assert np.isfinite(J).all() and np.isfinite(np.asarray(r0)).all(), tag


class TestSupportInvariant:
    @pytest.mark.parametrize("sqrt_pipeline", [True, False],
                             ids=["sqrt", "dense"])
    def test_margin_sequences_stay_in_support(self, sqrt_pipeline):
        for seed in (0, 1):
            for k, is_kf, prior in _run_sequence(sqrt_pipeline, seed):
                _assert_support(prior.J0, prior.r0,
                                f"step {k} ({'old' if is_kf else 'new'})")

    def test_margin_new_zeroes_dropped_then_relabels(self):
        """After margin-new, the information that sat on pose[W-2] is gone
        and the relabeled column W-2 (old pose W-1, which the prior never
        touches) is exactly zero."""
        priors = _run_sequence(True, seed=2, steps=12)
        c0 = layout.pose_col(W - 2)
        for k, is_kf, prior in priors:
            if is_kf:
                continue
            J = np.asarray(prior.J0)
            assert np.abs(J[:, c0:c0 + 6]).max() <= 1e-10 * max(
                np.abs(J).max(), 1e-30)

    def test_restricted_factorization_is_complete_f64(self):
        """The round-2 open hypothesis was that _SUPPORT might be
        INCOMPLETE for the margin-new replay. Disproof: for priors produced
        by real margin-old/margin-new sequences, the restricted (75-dim)
        factorization reproduces the dense factorization's information
        matrix to f64 precision — nothing outside the support carries
        information to lose."""
        priors = _run_sequence(False, seed=3, steps=16)
        for k, is_kf, prior in priors[::4]:
            H = np.asarray(prior.J0.T @ prior.J0)
            g = np.asarray(prior.J0.T @ prior.r0)
            Hj = jnp.asarray(H, jnp.float64)
            gj = jnp.asarray(g, jnp.float64)
            J_d, r_d = mrg._sqrt_factorize_dense(Hj, gj)
            old = mrg.RESTRICTED_SUPPORT
            mrg.RESTRICTED_SUPPORT = True
            try:
                J_r, r_r = mrg._sqrt_factorize(Hj, gj)
            finally:
                mrg.RESTRICTED_SUPPORT = old
            H_d = np.asarray(J_d.T @ J_d)
            H_r = np.asarray(J_r.T @ J_r)
            scale = max(np.abs(H_d).max(), 1e-30)
            np.testing.assert_allclose(H_r, H_d, atol=5e-9 * scale,
                                       err_msg=f"step {k}")
            g_d = np.asarray(J_d.T @ r_d)
            g_r = np.asarray(J_r.T @ r_r)
            gscale = max(np.abs(g_d).max(), 1e-30)
            np.testing.assert_allclose(g_r, g_d, atol=5e-9 * gscale,
                                       err_msg=f"step {k}")
