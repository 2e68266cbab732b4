"""FEJ-style Schur-complement marginalization (TPU-native).

Replaces the reference ``MarginalizationInfo`` / ``MarginalizationFactor``
machinery (src/backend/factor/marginalization_factor.cpp): when a frame
leaves the window, the factors touching it — the previous prior, the first
IMU factor, and the projection factors anchored there (optimizer.cpp:263-368)
— are linearized at the current (post-gauge-fix) state, the dropped states
(frame block + anchored inverse depths) are Schur-eliminated
(marginalization_factor.cpp:204-224), and the remaining Gauss-Newton system
is eigen-factorized back into a square-root prior (J0, r0)
(marginalization_factor.cpp:226-242).

Everything is fixed-shape: the prior lives on the full 171-dim tangent with
zero columns for uninvolved blocks, and the post-marginalization relabeling
(the reference's addr_shift pointer maps, optimizer.cpp:374-404) is a static
permutation matrix.

The pthread x4 Hessian assembly (marginalization_factor.cpp:163-201) is
replaced by the batched einsum assembly in solver/assembly.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.models.state import FeatureTable, WindowState, eligible_mask
from mobile_slam_tpu.solver import assembly, layout
from mobile_slam_tpu.solver.assembly import Prior, SolverParams, XState

W = NUM_SLOTS
S = layout.S
EIG_EPS = 1e-8       # reference's absolute threshold (marginalization_factor.h:77)
REL_EIG_EPS = 1e-4   # relative threshold after equilibration (float32-safe)

# The prior's support is invariantly {poses 0..9, speedbias 0, td,
# extrinsic} (76 tangent dims): after marg-old the kept blocks are the
# shifted {pose1..10, sb1, td, ex} (only sb1 couples through the dropped
# IMU factor, optimizer.cpp:317-332), and marg-new only shrinks that set.
# Restricting the eigen-factorization to this static subspace cuts the TPU
# cost of the per-frame eigendecomposition ~8x vs the full 172-dim tangent.
_SUPPORT = np.concatenate([
    np.arange(0, layout.pose_col(W - 1)),                    # poses 0..9
    np.arange(layout.sb_col(0), layout.sb_col(0) + 9),       # speedbias 0
    np.arange(layout.TD_COL, S),                             # td + extrinsic
]).astype(np.int32)

_PERM = {}


def _perm(kind: str, dtype) -> jax.Array:
    # Cached as numpy; converted per call so jit traces see a fresh constant.
    if kind not in _PERM:
        _PERM[kind] = layout.shift_permutation(kind, np.float64)
    return jnp.asarray(_PERM[kind], dtype=dtype)


def _eliminate_lambdas(H, g, H_sl, H_ll, g_l, drop_mask):
    """Schur-eliminate the (diagonal) dropped inverse-depth columns."""
    w = drop_mask.astype(H.dtype)
    inv = jnp.where(H_ll > 1e-10, 1.0 / jnp.maximum(H_ll, 1e-10), 0.0) * w
    H2 = H - (H_sl * inv[None, :]) @ H_sl.T
    g2 = g - H_sl @ (inv * g_l)
    return H2, g2


def _eliminate_frame_block(H, g, idx):
    """Schur-eliminate a static index set (pseudo-inverse on the dropped
    block, like the reference's eigen-thresholded Amm inverse,
    marginalization_factor.cpp:204-211). Diagonal equilibration keeps the
    eigendecomposition accurate in float32."""
    H_mm = H[jnp.ix_(idx, idx)]
    H_mm = 0.5 * (H_mm + H_mm.T)
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H_mm), 1e-20, None))
    Hn = H_mm / (d[:, None] * d[None, :])
    evals, evecs = jnp.linalg.eigh(Hn)
    emax = jnp.maximum(jnp.max(evals), 1e-20)
    keep = evals > REL_EIG_EPS * emax
    inv_evals = jnp.where(keep, 1.0 / jnp.maximum(evals, 1e-20), 0.0)
    # H_mm⁻¹ = D⁻¹ Hn⁻¹ D⁻¹.
    Hn_inv = (evecs * inv_evals[None, :]) @ evecs.T
    H_mm_inv = Hn_inv / (d[:, None] * d[None, :])
    H_rm = H[:, idx]
    g_m = g[idx]
    H2 = H - H_rm @ H_mm_inv @ H_rm.T
    g2 = g - H_rm @ (H_mm_inv @ g_m)
    # Zero the eliminated rows/cols so the permutation below moves clean data.
    zmask = jnp.ones((S,), H.dtype).at[idx].set(0.0)
    H2 = H2 * zmask[:, None] * zmask[None, :]
    g2 = g2 * zmask
    return H2, g2


def _sqrt_factorize_dense(H, g):
    """H = J0ᵀ J0, g = J0ᵀ r0 via thresholded eigendecomposition
    (marginalization_factor.cpp:226-242), equilibrated for float32: the
    prior Hessian spans ~1e7 in magnitude (whitened vision blocks vs bias
    blocks), so the eigensolve runs on D⁻¹HD⁻¹ with D = sqrt(diag)."""
    H = 0.5 * (H + H.T)
    diag = jnp.diagonal(H)
    empty = diag <= 1e-18           # untouched blocks stay exactly zero
    d = jnp.sqrt(jnp.where(empty, 1.0, diag))
    Hn = H / (d[:, None] * d[None, :])
    evals, evecs = jnp.linalg.eigh(Hn)
    emax = jnp.maximum(jnp.max(evals), 1e-20)
    keep = evals > REL_EIG_EPS * emax
    sqrt_e = jnp.where(keep, jnp.sqrt(jnp.maximum(evals, 1e-20)), 0.0)
    inv_sqrt_e = jnp.where(keep, 1.0 / jnp.maximum(sqrt_e, 1e-30), 0.0)
    # Hn = Vᵀ E V  =>  J0 = sqrt(E) Vᵀ D  (then J0ᵀJ0 = D Hn D = H).
    J0 = sqrt_e[:, None] * (evecs.T * d[None, :])
    r0 = inv_sqrt_e * (evecs.T @ (g / d))
    return J0, r0


# Support-restricted factorization: the prior provably touches only the 75
# dims {poses 0..9, speedbias 0, extrinsic} (see _SUPPORT), so the per-frame
# eigendecomposition can run on the 75x75 submatrix (~12x fewer eigh FLOPs;
# 228.8 -> 246.4 chunked fps on chip). It is numerically clean per call
# (J0^T J0 / J0^T r0 identical to 1e-15) and healthy on FEATURE-LEVEL
# sequences (E2E accuracy tests pass, gyro-bias converges to 2% in 30 s,
# scripts/dev_bias_convergence.py) — but on the IMAGE path, where 20 fps
# input makes margin-NEW (non-keyframe) elimination dominate, a controlled
# A/B on the 14 s noisy verify sequence flips a stable run (dense: ATE
# 0.150 m, no resets) into monocular scale runaway (restricted: gyro-bias
# estimate 10-20x true, median depth inflating 1.3x/s, ATE 1.0-1.3 m with
# resets). Round 1 independently observed restricted-path degradation
# through the margin-new replay before the margin-new bug was even fixed.
# MULTI-SEED VERDICT (scripts/dev_multiseed.py, 8 seeds x 14 s image path
# on chip, /tmp/multiseed.json 2026-08-17): dense ATE median 0.051 m / max
# 0.083 m; restricted median 0.048 m but a heavy tail — max 0.543 m, 3/8
# seeds visibly worse than their dense counterpart, 0 gate trips either
# arm. The two factorizations are equivalent in exact arithmetic
# (orthogonally-related square roots of the same prior Hessian), so the
# tail is the f32 rounding realization occasionally kicking a trajectory
# along the weakly-observable monocular-scale direction. DENSE stays the
# default: +7.7% chunked fps is not worth a 1-in-8 chance of ~10x ATE.
RESTRICTED_SUPPORT = False
_SUP_N = len(_SUPPORT)

# Square-root margin-new: eliminate the dropped pose block directly from the
# prior's square root (J0, r0) with 6 Householder reflections instead of
# forming H = J0ᵀJ0, Schur-eliminating, and re-eigendecomposing. The two are
# algebraically identical (an orthogonal Q preserves JᵀJ; dropping the
# triangularized rows IS the Schur complement, incl. the rank-deficient case
# — a zero pivot column skips its reflection and the dropped row carries
# nothing; validated to 4e-15 against the f64 pseudo-inverse Schur). In f32
# they are NOT equivalent: the dense path squares the prior — κ(H) ≈ κ(J)²
# ~ 1e9, putting the weakly-observable monocular-scale direction (2e-6
# relative curvature, scripts/dev_scale_observability.py) within ~20x of
# eigh's truncation floor (measured soft-direction error: dense 60x, QR
# 5e-6) — and it is ~10x cheaper (6 rank-1 updates vs a 171-dim eigh).
#
# E2E VERDICT (8 seeds x 14 s image path on chip, /tmp/multiseed_sq2.json
# 2026-08-17): dense median 0.030 m / max 0.046 m; sqrt median 0.031 m /
# max 0.187 m (one soft-tail seed, no gate trips). Same pattern as
# RESTRICTED_SUPPORT above: the per-call-better factorization does NOT win
# end-to-end — dense-eigh's truncation of the sub-eps scale direction acts
# as a regularizer (the noise it drops is re-supplied as fresh IMU scale
# information each frame), while the faithful sqrt path propagates the
# prior's correlated noise. DENSE stays default on the same evidence
# standard — but see SQRT_MARGIN_OLD below: the FULL square-root pipeline
# (margin-old + margin-new together) reverses this verdict and is now the
# default. Keep both flags equal; half-sqrt mixes are the bad configs.
SQRT_MARGIN_NEW = True

# Full square-root pipeline: margin-OLD also processed without ever forming
# J0ᵀJ0 of the prior (the sqrt-filter "measurement update"; the approach of
# "Square Root Marginalization for Sliding-Window Bundle Adjustment",
# arXiv 2109.02182, adapted to this solver's fixed-shape tangent layout):
#   1. fresh factors only (first IMU + frame-0-anchored projections,
#      use_prior=False) are assembled to (H_f, g_f); the dropped landmark
#      depths are Schur-eliminated there (diagonal block — squaring FRESH
#      information is benign, its conditioning is modest);
#   2. (H_f, g_f) is eigen-factorized once into rows (R_f, r_f) — again
#      fresh-only;
#   3. the prior enters as its RAW rows [J0 | r0 + J0·dx] (FEJ: Jacobian
#      frozen, residual advanced to the current state, exactly like
#      MarginalizationFactor::Evaluate);
#   4. the stacked (2S, S+1) system has the dropped frame block eliminated
#      by 15 Householder reflections and is recompressed to S rows by one
#      QR — both ORTHOGONAL operations, so the prior's weakly-observable
#      monocular-scale direction (2e-6 relative curvature,
#      scripts/dev_scale_observability.py: the prior carries ~78% of all
#      scale information) passes through with κ(J) conditioning instead of
#      κ(J)² ≈ 1e9 of the dense H=J0ᵀJ0 → Schur → eigh round trip.
# Algebraically identical to the dense path (orthogonally-related square
# roots of the same marginal information; f64 parity test in
# tests/test_sqrt_marginalization.py). Enable together with
# SQRT_MARGIN_NEW via enable_sqrt_pipeline() for the full-sqrt A/B.
#
# DEFAULT = True since the round-2 multiseed A/Bs (8 seeds x 14 s each):
#   * feature path, f32 CPU (scripts/dev_multiseed_features.py,
#     /tmp/multiseed_feat.json): dense ATE median 0.051 m / max 1.250 m
#     (one scale-soft tail event) vs sqrtfull median 0.005 m / max
#     0.011 m — ~10x better at median, tail eliminated.
#   * image path, on chip (scripts/dev_multiseed.py --arms=dense,sqrtfull,
#     /tmp/multiseed_img_sqrt.json 2026-08-18): dense median 0.044 m /
#     max 0.129 m vs sqrtfull median 0.008 m / max 0.018 m — 5.5x better
#     at median, 7x at max, 0 gate trips both arms.
# This also resolves why HALF-sqrt (SQRT_MARGIN_NEW alone) was worse in
# the earlier A/B: mixing a sqrt margin-new with a dense-eigh margin-old
# mixes inconsistent f32 representations of the same prior; all-sqrt is
# the coherent pipeline and κ(J) (not κ(J)²) conditioning wins end-to-end.
SQRT_MARGIN_OLD = True


def enable_sqrt_pipeline(on: bool = True) -> None:
    """Toggle the full square-root prior pipeline (margin-old + margin-new).
    Callers must re-jit (flags are trace-time constants)."""
    global SQRT_MARGIN_OLD, SQRT_MARGIN_NEW
    SQRT_MARGIN_OLD = on
    SQRT_MARGIN_NEW = on


def _householder_eliminate(M: jax.Array, cols):
    """Triangularize the given columns of M = [J | r] with one Householder
    reflection per column (static unroll), then return M with the first
    len(cols) rows (the triangular part that carries the eliminated DOFs)
    dropped and zero rows appended to keep the shape."""
    n = len(cols)
    for k, c in enumerate(cols):
        x = M[:, c].at[:k].set(0.0)       # rows 0..k-1 are already fixed
        sigma = jnp.sqrt(jnp.sum(x * x))
        # Reflection v = x + sign(x_k)·‖x‖·e_k; a (near-)zero column means
        # the prior does not constrain this DOF — skip via beta = 0.
        sgn = jnp.where(x[k] >= 0, 1.0, -1.0).astype(M.dtype)
        v = x.at[k].add(sgn * sigma)
        vtv = jnp.sum(v * v)
        beta = jnp.where(sigma > 1e-20, 2.0 / jnp.maximum(vtv, 1e-38), 0.0)
        M = M - beta * jnp.outer(v, v @ M)
    out = M[n:]
    return jnp.concatenate(
        [out, jnp.zeros((n,) + out.shape[1:], M.dtype)], axis=0)


def _sqrt_factorize(H, g):
    if not RESTRICTED_SUPPORT:
        return _sqrt_factorize_dense(H, g)
    dtype = H.dtype
    sup = jnp.asarray(_SUPPORT)
    Hs = H[jnp.ix_(sup, sup)]
    gs = g[sup]
    J0s, r0s = _sqrt_factorize_dense(Hs, gs)          # (75, 75), (75,)
    J0 = jnp.zeros((S, S), dtype).at[:_SUP_N, sup].set(J0s)
    r0 = jnp.zeros((S,), dtype).at[:_SUP_N].set(r0s)
    return J0, r0


def _permuted_linearization(kind: str, x: XState, ex_t, ex_q) -> dict:
    """Linearization states relabeled by the slide permutation."""
    if kind == "old":
        sl = [min(k + 1, W - 1) for k in range(W)]
    else:
        sl = [k for k in range(W - 2)] + [W - 1, W - 1]
    sl = jnp.asarray(sl)
    return dict(
        p0=x.p[sl], q0=x.q[sl], v0=x.v[sl], ba0=x.ba[sl], bg0=x.bg[sl],
        ex_t0=ex_t, ex_q0=ex_q, td0=x.td,
    )


def marginalize_old(
    x: XState,
    table: FeatureTable,
    window: WindowState,
    imu_sqrt_info: jax.Array,
    prior: Prior,
    ex_t: jax.Array, ex_q: jax.Array,
    params: SolverParams,
) -> Prior:
    """MARGIN_OLD_KEYFRAME: drop frame 0 + its anchored landmark depths
    (Optimizer::marginalizeOldKeyframe, optimizer.cpp:263-288)."""
    dtype = x.p.dtype
    elig = eligible_mask(table)

    # Factor subset: first IMU interval + projections anchored at frame 0.
    imu_valid = jnp.zeros((W - 1,), bool).at[0].set(True)
    imu_valid = imu_valid & (window.pre.sum_dt[1:] < 10.0) & (window.imu_cnt[1:] > 0)
    proj_valid = assembly.proj_valid_mask(table) & (table.start == 0)[:, None]
    drop_lam = elig & (table.start == 0)
    idx0_np = layout.frame_block_indices(0)
    idx0 = jnp.asarray(idx0_np, jnp.int32)
    P = _perm("old", dtype)

    if SQRT_MARGIN_OLD:
        # Full-sqrt update: fresh factors squared once (benign), prior rows
        # pass through orthogonal transforms only (see SQRT_MARGIN_OLD note).
        eqs = assembly.build_normal_eqs(
            x, table, window.pre, imu_sqrt_info, imu_valid, prior,
            jnp.zeros((S, S), dtype), ex_t, ex_q, params, proj_valid,
            use_prior=False, include_td_rw=False,
        )
        H_f, g_f = _eliminate_lambdas(eqs.H_ss, eqs.g_s, eqs.H_sl, eqs.H_ll,
                                      eqs.g_l, drop_lam)
        R_f, r_f = _sqrt_factorize_dense(H_f, g_f)
        dx = assembly.prior_dx(prior, x, ex_t, ex_q)
        r_pr = prior.r0 + prior.J0 @ dx
        M = jnp.concatenate([
            jnp.concatenate([R_f, r_f[:, None]], axis=1),
            jnp.concatenate([prior.J0, r_pr[:, None]], axis=1),
        ], axis=0)                                        # (2S, S+1)
        M = _householder_eliminate(M, list(idx0_np))
        zcols = jnp.ones((S,), dtype).at[idx0].set(0.0)
        M = M.at[:, :S].multiply(zcols[None, :])          # clear roundoff
        R = jnp.linalg.qr(M, mode="r")                    # (S+1, S+1)
        J0 = R[:S, :S] @ P.T                              # column relabel
        r0 = R[:S, S]
        return Prior(J0=J0, r0=r0,
                     **_permuted_linearization("old", x, ex_t, ex_q))

    prior_H0 = prior.J0.T @ prior.J0
    eqs = assembly.build_normal_eqs(
        x, table, window.pre, imu_sqrt_info, imu_valid, prior, prior_H0,
        ex_t, ex_q, params, proj_valid, include_td_rw=False,
    )

    H, g = _eliminate_lambdas(eqs.H_ss, eqs.g_s, eqs.H_sl, eqs.H_ll,
                              eqs.g_l, drop_lam)
    H, g = _eliminate_frame_block(H, g, idx0)

    H = P @ H @ P.T
    g = P @ g
    J0, r0 = _sqrt_factorize(H, g)
    return Prior(J0=J0, r0=r0, **_permuted_linearization("old", x, ex_t, ex_q))


def marginalize_new(
    x: XState,
    prior: Prior,
    ex_t: jax.Array, ex_q: jax.Array,
) -> Prior:
    """MARGIN_NEW_GENERAL_FRAME: drop the pose of the frame the slide
    discards — slot W-2, whose state is overwritten by the new frame
    (_slide_window_new) — from the prior alone
    (Optimizer::marginalizeNewGeneralFrame, optimizer.cpp:290-315: the
    reference drops para_Pose[WINDOW_SIZE-1], i.e. pose 9 of 0..10, and
    relabels pose 10 -> 9). If the prior does not involve pose[W-2] (e.g.
    after consecutive margin-new steps already removed it), it is returned
    unchanged — the reference skips marginalization entirely in that case.

    ROUND1 BUG (root cause of the margin-new anomaly): this used to
    eliminate pose[W-1] — the NEW frame, which is never in the prior's
    support — making margin-new an unconditional no-op. The prior's
    pose[W-2] block then stayed anchored to the DISCARDED frame's
    linearization state while the slide moved the new frame into that slot,
    so every non-keyframe pulled slot W-2 toward a stale pose."""
    dtype = x.p.dtype
    c0 = layout.pose_col(W - 2)
    coupled = jnp.sum(jnp.abs(prior.J0[:, c0:c0 + 6])) > 0

    dx = assembly.prior_dx(prior, x, ex_t, ex_q)
    r = prior.r0 + prior.J0 @ dx
    P = _perm("new", dtype)

    if SQRT_MARGIN_NEW:
        # Orthogonal column elimination straight on the square root: see
        # the SQRT_MARGIN_NEW note above for why this beats squaring.
        M = jnp.concatenate([prior.J0, r[:, None]], axis=1)  # (S, S+1)
        M = _householder_eliminate(M, list(range(c0, c0 + 6)))
        zcols = jnp.ones((S,), dtype).at[c0:c0 + 6].set(0.0)
        J2 = M[:, :S] * zcols[None, :]   # clear roundoff in dropped cols
        r0_new = M[:, S]
        J0_new = J2 @ P.T                # column relabel (rows untouched)
        new_prior = Prior(J0=J0_new, r0=r0_new,
                          **_permuted_linearization("new", x, ex_t, ex_q))
        return jax.tree.map(
            lambda a, b: jnp.where(coupled, a, b), new_prior, prior
        )

    H = prior.J0.T @ prior.J0
    g = prior.J0.T @ r

    idx = jnp.arange(c0, c0 + 6, dtype=jnp.int32)
    H2, g2 = _eliminate_frame_block(H, g, idx)
    H2 = P @ H2 @ P.T
    g2 = P @ g2
    J0, r0 = _sqrt_factorize(H2, g2)
    new_prior = Prior(J0=J0, r0=r0,
                      **_permuted_linearization("new", x, ex_t, ex_q))
    return jax.tree.map(
        lambda a, b: jnp.where(coupled, a, b), new_prior, prior
    )
