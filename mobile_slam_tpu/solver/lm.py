"""Sliding-window Levenberg-Marquardt solver with landmark Schur complement.

TPU-native replacement for the reference's Ceres DENSE_SCHUR + DOGLEG solve
(Optimizer::solveCeresProblem, src/backend/optimizer.cpp:145-155): a
fixed-iteration LM loop (the reference budgets <=10 iterations /
max_solver_time) where each iteration

  1. assembles the batched normal equations (assembly.py),
  2. dampens with a Marquardt diagonal,
  3. Schur-eliminates the (scalar) inverse depths — `H_ll` is diagonal, so
     the reduced 165x165 system is one rank-F correction, solved by Cholesky,
  4. retracts on the manifold (quaternion ⊞) and accepts/rejects by cost.

After the loop the 4-dof gauge drift is removed exactly as
``Optimizer::applyOptimizationResults`` does (optimizer.cpp:157-205):
yaw+position of frame 0 are rotated back to their pre-solve values, with the
euler-singularity fallback.

The state/depth updates and NaN rollback mirror optimizer.cpp:36-55,
feature_manager setDepth semantics (solve_flag=2 on negative depth).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov
from mobile_slam_tpu.models.state import FeatureTable, WindowState, eligible_mask
from mobile_slam_tpu.solver import assembly, layout
from mobile_slam_tpu.solver.assembly import Prior, SolverParams, XState
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS
S = layout.S
NSOLVE = layout.EX_COL  # 166 solved dims: 165 frame dims + td (extrinsic
                        # held constant, optimizer.cpp:73
                        # SetParameterBlockConstant; the td column's
                        # Jacobian is gated by SolverParams.td_enable so
                        # td stays frozen unless estimate_td is on)
# Mean whitened reprojection error (units of 1.5px) above which a landmark
# is culled after the solve: 2.0 ≈ 3 pixels.
OUTLIER_REPROJ_WHITENED = 2.0

# Greedy dual-candidate evaluation (solver/lm.solve): the LM step tries a
# near-Gauss-Newton candidate and a conservative Marquardt candidate each
# iteration. False (default) solves and scores BOTH and keeps the better —
# two Schur solves + two cost evaluations per iteration. True wraps the
# fallback candidate in a lax.cond so it is only computed when the GN
# candidate failed to lower the cost (Ceres' DOGLEG likewise prefers the
# GN step outright when it is admissible) — on converged tracking frames
# this halves the per-iteration solver cost. Semantics differ only on
# iterations where BOTH candidates improve the cost and the damped one
# improves it more; the multiseed E2E A/B (dev_multiseed.py arm token
# ":greedy=1") gates any default flip per the ROUND2_NOTES cautionary tale.
GREEDY_GN = False

# Batched dual-candidate evaluation (solver/lm.solve): when True, the two
# LM candidates (near-GN and conservative Marquardt) are solved by ONE
# vmapped Schur solve (a (2, 165, 165) batched Cholesky) and scored by ONE
# vmapped cost evaluation, instead of two sequential solve+cost chains.
# The per-candidate arithmetic is identical; only the XLA scheduling
# changes (batched kernels vs two serial dispatch chains), so results may
# differ at f32-rounding level — which, per ROUND2_NOTES' scale-softness
# analysis, is enough to move individual draws. Any default flip is gated
# on the image-path multiseed A/B (dev_multiseed.py arm token
# ":batchcand=1") per the ROUND2_NOTES cautionary tale.
BATCH_CANDIDATES = False

# Ceres-style function-tolerance early exit (solver/lm.solve): when set to a
# float, the fixed-count fori_loop becomes a while_loop that stops once an
# accepted step improves the cost by less than ftol * cost — the same
# convergence contract as Ceres' function_tolerance (the reference runs
# Ceres with its default 1e-6 and an 8-iteration budget, so it ALSO stops
# early on converged frames; optimizer.cpp:145-155). The executed iterations
# are numerically identical to the fixed-count path — only trailing
# no-improvement iterations are skipped — so per-frame poses match wherever
# the fixed path had already converged. None = fixed iteration count.
# NOTE: any default flip requires the multiseed E2E A/B (dev_multiseed.py)
# per the ROUND2_NOTES cautionary tale.
EARLY_EXIT_FTOL: float | None = None


class SolveResult(NamedTuple):
    x: XState
    cost0: jax.Array
    cost: jax.Array
    accepted: jax.Array  # number of accepted LM steps
    # td observability (GN curvature of the projection cost w.r.t. td at
    # the solved state) and the gated scalar innovation -g/h — computed in
    # optimize() AFTER the joint solve, which holds td constant (see
    # assembly.td_grad_hess for why td is not a joint dimension).
    td_info: jax.Array
    td_innov: jax.Array
    td_wsum: jax.Array  # total robust weight (≈ #valid obs) behind td_info


def _retract(x: XState, dx: jax.Array, dlam: jax.Array,
             lam_mask: jax.Array) -> XState:
    dpose = dx[0:layout.POSE_COLS].reshape(W, 6)
    dsb = dx[layout.POSE_COLS:layout.TD_COL].reshape(W, 9)
    return XState(
        p=x.p + dpose[:, 0:3],
        q=rot.quat_boxplus(x.q, dpose[:, 3:6]),
        v=x.v + dsb[:, 0:3],
        ba=x.ba + dsb[:, 3:6],
        bg=x.bg + dsb[:, 6:9],
        lam=x.lam + jnp.where(lam_mask, dlam, 0.0),
        td=x.td + dx[layout.TD_COL],
    )


def _solve_damped(eqs: assembly.NormalEqs, mu: jax.Array,
                  lam_mask: jax.Array, dtype):
    """One damped Schur-complement solve: returns (dx (165,), dlam (F,)).

    Damping policy: near-Gauss-Newton. The bias random-walk chains put
    ~1e12-1e15 on the speed/bias diagonal while the collective-bias valley
    mode has stiffness ~1e6; Marquardt damping mu*diag at any mu >= 1e-8
    freezes the biases entirely (the failure Ceres' DOGLEG avoids by using
    the undamped GN step). So mu starts tiny and the PSD/gauge floor is an
    absolute term scaled by the MEDIAN diagonal (robust to the stiff
    outliers), which regularizes gauge null-spaces without touching the
    valley."""
    H = eqs.H_ss[:NSOLVE, :NSOLVE]
    g = eqs.g_s[:NSOLVE]
    H_sl = eqs.H_sl[:NSOLVE]

    diag = jnp.diagonal(H)
    med = jnp.median(diag)
    floor = 1e-7 * med + 1e-10
    H_d = H + jnp.diag(mu * diag + floor)
    hll = eqs.H_ll * (1.0 + mu) + 1e-6 * jnp.median(eqs.H_ll) + 1e-12
    hll = jnp.where(lam_mask, hll, 1.0)  # inert rows for inactive landmarks
    inv_hll = 1.0 / hll

    H_red = H_d - (H_sl * (inv_hll * lam_mask)[None, :]) @ H_sl.T
    g_red = g - H_sl @ (inv_hll * eqs.g_l * lam_mask)

    # Diagonal equilibration before the Cholesky: the reduced system mixes
    # whitened vision (~1e5) and bias (~1e-2) scales, beyond float32's
    # comfortable range.
    d = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
    Hn = H_red / (d[:, None] * d[None, :])
    L = jnp.linalg.cholesky(Hn)
    dxn = -jax.scipy.linalg.cho_solve((L, True), g_red / d)
    dx = dxn / d
    dlam = -(eqs.g_l + H_sl.T @ dx) * inv_hll
    # Cholesky failure (non-PSD) -> NaNs; caller's accept logic rejects them.
    return dx, dlam


def solve(
    x0: XState,
    table: FeatureTable,
    window: WindowState,
    prior: Prior,
    ex_t: jax.Array,
    ex_q: jax.Array,
    params: SolverParams,
    num_iterations: int,
    mu_init: float = 1e-8,
) -> SolveResult:
    """Run the LM loop. Fixed iteration count (jit-static)."""
    dtype = x0.p.dtype

    imu_sqrt_info = sqrt_info_from_cov(window.pre.cov[1:])
    imu_valid = (window.pre.sum_dt[1:] < 10.0) & (window.imu_cnt[1:] > 0)
    proj_valid = assembly.proj_valid_mask(table)
    lam_mask = eligible_mask(table)
    prior_H0 = prior.J0.T @ prior.J0

    def cost_fn(x):
        return assembly.total_cost(
            x, table, window.pre, imu_sqrt_info, imu_valid, prior,
            ex_t, ex_q, params, proj_valid,
        )

    cost0 = cost_fn(x0)

    def step(carry):
        x, cost, mu, n_acc = carry
        eqs = assembly.build_normal_eqs(
            x, table, window.pre, imu_sqrt_info, imu_valid, prior, prior_H0,
            ex_t, ex_q, params, proj_valid,
        )
        # Dogleg-style dual candidate: a near-Gauss-Newton step (traverses
        # the stiff bias-chain valley like Ceres' DOGLEG GN step does) and a
        # conservative Marquardt step (safe far from the optimum). Take
        # whichever lowers the robust cost more (GREEDY_GN: take the GN
        # step outright when it improves, computing the fallback lazily).
        if BATCH_CANDIDATES and not GREEDY_GN:
            # One batched Schur solve + one batched cost eval for both
            # candidates: halves the serial dispatch chain per iteration
            # (the 165x165 Cholesky and the cost evaluation are latency-
            # bound at this size, so the batch-2 versions cost ~the same
            # as one).
            mus = jnp.stack([mu, jnp.asarray(1e-4, dtype)])
            dxs, dlams = jax.vmap(
                lambda m: _solve_damped(eqs, m, lam_mask, dtype))(mus)
            xs = jax.vmap(lambda d, dl: _retract(x, d, dl, lam_mask))(
                dxs, dlams)
            costs = jax.vmap(cost_fn)(xs)
            x_a = jax.tree.map(lambda t: t[0], xs)
            x_b = jax.tree.map(lambda t: t[1], xs)
            cost_a, cost_b = costs[0], costs[1]
        else:
            dx_a, dlam_a = _solve_damped(eqs, mu, lam_mask, dtype)
            x_a = _retract(x, dx_a, dlam_a, lam_mask)
            cost_a = cost_fn(x_a)

            def eval_b(_):
                dx_b, dlam_b = _solve_damped(eqs, jnp.asarray(1e-4, dtype),
                                             lam_mask, dtype)
                x_b = _retract(x, dx_b, dlam_b, lam_mask)
                return x_b, cost_fn(x_b)

            if GREEDY_GN:
                good_a = jnp.isfinite(cost_a) & (cost_a < cost)
                x_b, cost_b = jax.lax.cond(
                    good_a, lambda _: (x_a, cost_a), eval_b, None)
            else:
                x_b, cost_b = eval_b(None)
        use_a = jnp.isfinite(cost_a) & (cost_a <= jnp.where(
            jnp.isfinite(cost_b), cost_b, jnp.inf))
        x_new = jax.tree.map(lambda a, b: jnp.where(use_a, a, b), x_a, x_b)
        cost_new = jnp.where(use_a, cost_a, cost_b)
        ok = jnp.isfinite(cost_new) & (cost_new < cost)
        x = jax.tree.map(lambda a, b: jnp.where(ok, a, b), x_new, x)
        new_cost = jnp.where(ok, cost_new, cost)
        mu = jnp.where(ok & use_a, jnp.maximum(mu * 0.25, 1e-12),
                       jnp.where(ok, mu, jnp.minimum(mu * 10.0, 1e4)))
        return (x, new_cost, mu, n_acc + ok.astype(jnp.int32)), ok, cost

    init = (x0, cost0, jnp.asarray(mu_init, dtype), jnp.asarray(0, jnp.int32))
    if EARLY_EXIT_FTOL is None:
        def body(_, carry):
            new_carry, _, _ = step(carry)
            return new_carry
        x, cost, _, n_acc = jax.lax.fori_loop(0, num_iterations, body, init)
    else:
        ftol = float(EARLY_EXIT_FTOL)

        def cond_w(wcarry):
            it, done, _ = wcarry
            return (it < num_iterations) & ~done

        def body_w(wcarry):
            it, _, carry = wcarry
            new_carry, ok, cost_before = step(carry)
            # Converged: an accepted step whose relative improvement fell
            # below ftol (Ceres function_tolerance semantics). A rejected
            # step keeps iterating — mu just grew, the next try may land.
            improve = (cost_before - new_carry[1]) / jnp.maximum(
                cost_before, jnp.asarray(1e-30, dtype))
            done = ok & (improve < ftol)
            return it + 1, done, new_carry

        _, _, (x, cost, _, n_acc) = jax.lax.while_loop(
            cond_w, body_w, (jnp.asarray(0, jnp.int32),
                             jnp.asarray(False), init))
    return SolveResult(x=x, cost0=cost0, cost=cost, accepted=n_acc,
                       td_info=jnp.zeros((), dtype),
                       td_innov=jnp.zeros((), dtype),
                       td_wsum=jnp.zeros((), dtype))


def apply_gauge_fix(x: XState, p0_old: jax.Array, q0_old: jax.Array) -> XState:
    """Rotate the solution so frame-0 yaw and position match their pre-solve
    values (applyOptimizationResults, optimizer.cpp:157-205)."""
    r0_old = rot.quat_to_rot(q0_old)
    r0_new = rot.quat_to_rot(x.q[0])
    ypr_old = rot.r2ypr(r0_old)
    ypr_new = rot.r2ypr(r0_new)
    y_diff = ypr_old[0] - ypr_new[0]
    rot_diff = rot.ypr2r(jnp.stack([y_diff, jnp.zeros_like(y_diff),
                                    jnp.zeros_like(y_diff)]))
    singular = (jnp.abs(jnp.abs(ypr_old[1]) - 90.0) < 1.0) | (
        jnp.abs(jnp.abs(ypr_new[1]) - 90.0) < 1.0
    )
    rot_diff = jnp.where(singular, r0_old @ r0_new.T, rot_diff)
    q_diff = rot.rot_to_quat(rot_diff)

    p_fixed = (x.p - x.p[0:1]) @ rot_diff.T + p0_old
    q_fixed = rot.quat_normalize(rot.quat_mul(q_diff[None, :], x.q))
    v_fixed = x.v @ rot_diff.T
    return XState(p=p_fixed, q=q_fixed, v=v_fixed, ba=x.ba, bg=x.bg,
                  lam=x.lam, td=x.td)


def optimize(
    window: WindowState,
    table: FeatureTable,
    prior: Prior,
    ex_t: jax.Array,
    ex_q: jax.Array,
    params: SolverParams,
    num_iterations: int,
    td0: jax.Array | float = 0.0,
) -> tuple[WindowState, FeatureTable, SolveResult]:
    """Full Optimizer::optimize equivalent (minus marginalization, which the
    caller runs next): solve, NaN rollback, gauge fix, write back depths.
    ``td0`` is the current camera-IMU time-offset estimate; the joint solve
    holds it constant, and a scalar GN step on the projection cost computes
    the td innovation afterwards (assembly.td_grad_hess) — returned in
    SolveResult.td_innov with its curvature in td_info for the estimator's
    observability-gated fusion."""
    elig = eligible_mask(table)
    safe_depth = jnp.where(table.depth > 0, table.depth, params.init_depth)
    lam0 = jnp.where(elig, 1.0 / safe_depth, 1.0)
    dtype = window.p.dtype
    x0 = XState(p=window.p, q=window.q, v=window.v, ba=window.ba,
                bg=window.bg, lam=lam0, td=jnp.asarray(td0, dtype))

    res = solve(x0, table, window, prior, ex_t, ex_q, params, num_iterations)

    # NaN/Inf rollback (optimizer.cpp:47-55).
    finite = jnp.all(jnp.asarray([
        jnp.all(jnp.isfinite(res.x.p)), jnp.all(jnp.isfinite(res.x.q)),
        jnp.all(jnp.isfinite(res.x.v)), jnp.all(jnp.isfinite(res.x.ba)),
        jnp.all(jnp.isfinite(res.x.bg)), jnp.all(jnp.isfinite(res.x.lam)),
        jnp.isfinite(res.x.td),
    ]))
    x = jax.tree.map(lambda a, b: jnp.where(finite, a, b), res.x, x0)
    # Gate + clamp td: frozen at td0 when disabled, bounded when enabled
    # (a runaway td would silently warp every observation).
    td = jnp.where(params.td_enable > 0,
                   jnp.clip(x.td, -params.td_max, params.td_max), x0.td)
    x = x._replace(td=td)

    x = apply_gauge_fix(x, window.p[0], window.q[0])

    # Decoupled scalar td update at the solved state (see td_grad_hess).
    proj_valid_td = assembly.proj_valid_mask(table)
    g_td, h_td, wsum_td = assembly.td_grad_hess(x, table, ex_t, ex_q, params,
                                                proj_valid_td)
    innov = jnp.where(h_td > 0, -g_td / jnp.maximum(h_td, 1e-6), 0.0)
    innov = jnp.where(jnp.isfinite(innov), innov, 0.0)
    res = res._replace(td_info=h_td, td_innov=innov * params.td_enable,
                       td_wsum=wsum_td)

    window = window._replace(p=x.p, q=x.q, v=x.v, ba=x.ba, bg=x.bg)

    # setDepth parity (feature_manager.cpp:96-110): depth = 1/λ;
    # negative -> solve_flag 2 (removed later by remove_failures).
    new_depth = 1.0 / x.lam
    neg = new_depth < 0
    depth = jnp.where(elig & ~neg, new_depth, table.depth)

    # Reprojection-error outlier culling (beyond the reference, which relies
    # on Cauchy only): landmarks whose mean reprojection error at the
    # converged state exceeds ~outlier_px pixels are flagged for removal —
    # kills 'ghost' corners (non-rigid intersections, occlusion edges) that
    # robust weighting alone cannot suppress.
    from mobile_slam_tpu.factors import projection as proj_mod

    proj_valid = assembly.proj_valid_mask(table)
    start = jnp.clip(table.start, 0, W - 1)
    ray_a = jnp.take_along_axis(table.obs, start[:, None, None], axis=1)[:, 0]
    vel_a = jnp.take_along_axis(table.vel, start[:, None, None], axis=1)[:, 0]
    r_p = proj_mod.residual(
        ray_a[:, None, :], table.obs, x.lam[:, None],
        x.p[start][:, None, :], x.q[start][:, None, :],
        x.p[None, :, :], x.q[None, :, :],
        ex_t, ex_q, params.sqrt_info_proj,
        vel_i=vel_a[:, None, :], vel_j=table.vel, td=x.td,
    )
    err = jnp.linalg.norm(r_p, axis=-1) * proj_valid  # whitened (px/1.5)
    n_obs = jnp.maximum(jnp.sum(proj_valid, axis=1), 1)
    mean_err = jnp.sum(err, axis=1) / n_obs
    outlier = elig & (mean_err > OUTLIER_REPROJ_WHITENED)

    solve_flag = jnp.where(
        elig, jnp.where(neg | outlier, 2, 1).astype(jnp.int32),
        table.solve_flag,
    )
    # Ids culled this solve — fed back to the tracker so rejected landmarks
    # are not immediately re-tracked (the reference lacks this loop; its
    # removeFailures victims get re-added by the tracker next frame).
    culled_ids = jnp.where(elig & outlier, table.fid, -1)
    table = table._replace(depth=depth, solve_flag=solve_flag)
    return window, table, res._replace(x=x), culled_ids
