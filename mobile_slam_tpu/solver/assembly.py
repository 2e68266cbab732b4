"""Residual/Jacobian assembly for the sliding-window problem (TPU-native).

Replaces the reference's per-factor Ceres cost functions and the pthread
Hessian fan-out (optimizer.cpp:88-143, marginalization_factor.cpp:163-201)
with three batched evaluations — the 10 IMU factors, the full
(features x window) projection grid, and the linear marginalization prior —
whose normal equations are formed by einsums on the MXU.

Jacobians come from forward-mode autodiff of the residual w.r.t. manifold
perturbations (quaternion ⊞), which reproduces the reference's hand-derived
analytic Jacobians by construction.

All builders honor validity masks so one fixed shape serves both the
optimizer (all factors) and marginalization (the dropped-state subset,
optimizer.cpp:317-368).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import NUM_SLOTS
from mobile_slam_tpu.factors import imu_factor, projection
from mobile_slam_tpu.imu.preintegration import Preintegration
from mobile_slam_tpu.models.state import FeatureTable, WindowState, eligible_mask
from mobile_slam_tpu.solver import layout
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS
S = layout.S
# 66 pose cols + 1 td col + 6 extrinsic cols = 73 (one contiguous band
# [0..65] plus the contiguous tail [TD_COL..S)).
PROJ_COLS = layout.POSE_COLS + 1 + 6
_IMU_EMBED = None  # lazily-built compile-time constant
# 0.0 = td is NOT a joint-solve dimension (scalar closed-form update only).
TD_JOINT_GATE = 0.0


class SolverParams(NamedTuple):
    gravity: jax.Array        # (3,)
    sqrt_info_proj: jax.Array # () focal/1.5
    cauchy_scale: jax.Array   # ()
    init_depth: jax.Array     # ()
    # 0/1 gate for online camera-IMU time-offset estimation: scales the td
    # Jacobian column, so td stays exactly frozen when disabled (no
    # coupling into other states; see config.EstimatorConfig.estimate_td).
    td_enable: jax.Array = 0.0  # ()
    td_max: jax.Array = 0.08    # () hard clamp on |td| after each solve
    # Random-walk prior strength on td, anchored at Prior.td0 (the last
    # solved estimate). td rides a near-flat (poses <-> time-shift) valley
    # whenever velocity is locally constant; without an anchor the joint
    # solve leaks td toward the pose-absorbed solution (measured:
    # truth-initialized td drains 9.5 -> 0.5 ms over ~20 slow frames while
    # a td-only cost scan still points the right way,
    # scripts/dev_td_probe.py --cost-scan). A constant diagonal prior
    # H[td,td] += td_rw_info holds the valley without the FEJ accumulation
    # that over-anchored the full marginalization treatment.
    td_rw_info: jax.Array = 0.0  # ()


class XState(NamedTuple):
    """The optimizable state: window poses/speeds/biases + inverse depths
    + the camera-IMU time offset td."""

    p: jax.Array    # (11, 3)
    q: jax.Array    # (11, 4)
    v: jax.Array    # (11, 3)
    ba: jax.Array   # (11, 3)
    bg: jax.Array   # (11, 3)
    lam: jax.Array  # (F,) inverse depths
    td: jax.Array   # () camera-IMU time offset (seconds)


class Prior(NamedTuple):
    """Linearized marginalization prior: r(x) = r0 + J0 (x ⊟ x0)
    (MarginalizationFactor::Evaluate, marginalization_factor.cpp:274-315).
    An all-zero J0/r0 is a valid 'no prior yet' state."""

    J0: jax.Array    # (S, S)
    r0: jax.Array    # (S,)
    p0: jax.Array    # (11, 3) linearization points
    q0: jax.Array    # (11, 4)
    v0: jax.Array    # (11, 3)
    ba0: jax.Array   # (11, 3)
    bg0: jax.Array   # (11, 3)
    ex_t0: jax.Array # (3,)
    ex_q0: jax.Array # (4,)
    td0: jax.Array   # () td linearization point


def zero_prior(ex_t: jax.Array, ex_q: jax.Array, dtype=jnp.float32,
               td: jax.Array | float = 0.0) -> Prior:
    return Prior(
        J0=jnp.zeros((S, S), dtype),
        r0=jnp.zeros((S,), dtype),
        p0=jnp.zeros((W, 3), dtype),
        q0=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype), (W, 1)),
        v0=jnp.zeros((W, 3), dtype),
        ba0=jnp.zeros((W, 3), dtype),
        bg0=jnp.zeros((W, 3), dtype),
        ex_t0=ex_t.astype(dtype),
        ex_q0=ex_q.astype(dtype),
        td0=jnp.asarray(td, dtype),
    )


def prior_dx(prior: Prior, x: XState, ex_t: jax.Array, ex_q: jax.Array) -> jax.Array:
    """Full-state tangent difference x ⊟ x0 (quaternion-aware), shape (S,)."""
    dp = x.p - prior.p0                       # (11,3)
    dth = rot.quat_boxminus(x.q, prior.q0)    # (11,3)
    dpose = jnp.concatenate([dp, dth], axis=-1).reshape(-1)        # (66,)
    dsb = jnp.concatenate(
        [x.v - prior.v0, x.ba - prior.ba0, x.bg - prior.bg0], axis=-1
    ).reshape(-1)                                                   # (99,)
    dtd = (x.td - prior.td0)[None]                                  # (1,)
    dex = jnp.concatenate(
        [ex_t - prior.ex_t0, rot.quat_boxminus(ex_q, prior.ex_q0)], axis=-1
    )                                                               # (6,)
    return jnp.concatenate([dpose, dsb, dtd, dex])


# ---------------------------------------------------------------------------
# IMU factors
# ---------------------------------------------------------------------------

def _imu_residual_pert(delta, pre_leaf, x_i, x_j, sqrt_info, gravity):
    """IMU residual as a function of the 30-d perturbation [δi(15), δj(15)]."""
    p_i = x_i[0] + delta[0:3]
    q_i = rot.quat_boxplus(x_i[1], delta[3:6])
    v_i = x_i[2] + delta[6:9]
    ba_i = x_i[3] + delta[9:12]
    bg_i = x_i[4] + delta[12:15]
    p_j = x_j[0] + delta[15:18]
    q_j = rot.quat_boxplus(x_j[1], delta[18:21])
    v_j = x_j[2] + delta[21:24]
    ba_j = x_j[3] + delta[24:27]
    bg_j = x_j[4] + delta[27:30]
    pre = Preintegration(*pre_leaf)
    return imu_factor.whitened_residual(
        pre, p_i, q_i, v_i, ba_i, bg_i, p_j, q_j, v_j, ba_j, bg_j,
        gravity, sqrt_info,
    )


def imu_res_jac(x: XState, pre: Preintegration, imu_sqrt_info: jax.Array,
                gravity: jax.Array):
    """Residuals (10, 15) and Jacobians (10, 15, 30) for the 10 interval
    factors (factor i connects frames i and i+1; preintegration stored at
    slot i+1)."""
    def one(i):
        x_i = (x.p[i], x.q[i], x.v[i], x.ba[i], x.bg[i])
        x_j = (x.p[i + 1], x.q[i + 1], x.v[i + 1], x.ba[i + 1], x.bg[i + 1])
        pre_leaf = tuple(leaf[i + 1] for leaf in pre)
        f = lambda d: _imu_residual_pert(
            d, pre_leaf, x_i, x_j, imu_sqrt_info[i], gravity
        )
        zero = jnp.zeros((30,), x.p.dtype)
        return f(zero), jax.jacfwd(f)(zero)

    return jax.vmap(one)(jnp.arange(W - 1))


# ---------------------------------------------------------------------------
# Projection factors
# ---------------------------------------------------------------------------

def _proj_residual_pert(delta, ray_a, ray_j, lam_f, pose_a, pose_t, ex,
                        sqrt_info, vel_a, vel_j, td0, td_enable):
    """Projection residual vs the 20-d perturbation
    [δpose_anchor(6), δpose_target(6), δex(6), δλ(1), δtd(1)].

    The td perturbation is gated by ``td_enable`` (0/1): with the gate off
    the Jacobian column is exactly zero, so td stays frozen at td0 (the
    reference has no td state at all; docs/analysis-report.md:408-418)."""
    p_i = pose_a[0] + delta[0:3]
    q_i = rot.quat_boxplus(pose_a[1], delta[3:6])
    p_j = pose_t[0] + delta[6:9]
    q_j = rot.quat_boxplus(pose_t[1], delta[9:12])
    t_ic = ex[0] + delta[12:15]
    q_ic = rot.quat_boxplus(ex[1], delta[15:18])
    lam = lam_f + delta[18]
    # td_joint_gate is 0: the joint solver holds td constant (the scalar
    # closed-form update in td_grad_hess/optimize moves it instead — the
    # (poses <-> time-shift) valley makes the JOINT estimate leak toward
    # the pose-absorbed solution; see config.EstimatorConfig notes).
    td = td0 + td_enable * TD_JOINT_GATE * delta[19]
    return projection.residual(
        ray_a, ray_j, lam, p_i, q_i, p_j, q_j, t_ic, q_ic, sqrt_info,
        vel_i=vel_a, vel_j=vel_j, td=td,
    )


def proj_res_jac(x: XState, table: FeatureTable, ex_t: jax.Array,
                 ex_q: jax.Array, sqrt_info: jax.Array,
                 td_enable: jax.Array):
    """Residuals (F, W, 2) and Jacobians (F, W, 2, 20) over the observation
    grid. Invalid cells produce garbage; callers mask with proj_valid."""
    start = jnp.clip(table.start, 0, W - 1)
    ray_a = jnp.take_along_axis(table.obs, start[:, None, None], axis=1)[:, 0]  # (F,3)
    vel_a = jnp.take_along_axis(table.vel, start[:, None, None], axis=1)[:, 0]  # (F,2)
    p_a = x.p[start]      # (F, 3)
    q_a = x.q[start]      # (F, 4)

    def one(ray_a_f, lam_f, p_a_f, q_a_f, obs_row, vel_a_f, vel_row):
        def per_frame(j, ray_j, vel_j):
            f = lambda d: _proj_residual_pert(
                d, ray_a_f, ray_j, lam_f,
                (p_a_f, q_a_f), (x.p[j], x.q[j]), (ex_t, ex_q), sqrt_info,
                vel_a_f, vel_j, x.td, td_enable,
            )
            zero = jnp.zeros((20,), x.p.dtype)
            return f(zero), jax.jacfwd(f)(zero)

        return jax.vmap(per_frame)(jnp.arange(W), obs_row, vel_row)

    return jax.vmap(one)(ray_a, x.lam, p_a, q_a, table.obs, vel_a, table.vel)


def proj_valid_mask(table: FeatureTable) -> jax.Array:
    """(F, W) factor validity: eligible feature, observed frame, not the
    anchor itself (optimizer.cpp:127-140)."""
    elig = eligible_mask(table)
    j_idx = jnp.arange(W)[None, :]
    return table.mask & elig[:, None] & (j_idx != table.start[:, None])


# ---------------------------------------------------------------------------
# Normal equations
# ---------------------------------------------------------------------------

class NormalEqs(NamedTuple):
    """Gauss-Newton system over the full S-dim tangent + F landmark depths."""

    H_ss: jax.Array   # (S, S)
    g_s: jax.Array    # (S,)
    H_sl: jax.Array   # (S, F)
    H_ll: jax.Array   # (F,) diagonal (inverse depth is scalar per landmark)
    g_l: jax.Array    # (F,)
    cost: jax.Array   # () robustified total cost


def _imu_embed(dtype):
    # Cached as numpy; converted per call so jit traces see a fresh constant.
    global _IMU_EMBED
    if _IMU_EMBED is None:
        _IMU_EMBED = layout.imu_embed_matrices(np.float64)
    return jnp.asarray(_IMU_EMBED, dtype=dtype)


def _proj_cols_index() -> jax.Array:
    """Static indices of the 73 columns projection factors touch:
    the 66 pose columns plus the contiguous [td | extrinsic] tail."""
    return jnp.asarray(
        np.concatenate([np.arange(layout.POSE_COLS),
                        np.arange(layout.TD_COL, S)]),
        dtype=jnp.int32,
    )


def build_normal_eqs(
    x: XState,
    table: FeatureTable,
    pre: Preintegration,
    imu_sqrt_info: jax.Array,   # (10, 15, 15)
    imu_valid: jax.Array,       # (10,) bool
    prior: Prior,
    prior_H0: jax.Array,        # (S, S) = J0ᵀ J0 (precomputed)
    ex_t: jax.Array, ex_q: jax.Array,
    params: SolverParams,
    proj_valid: jax.Array,      # (F, W)
    use_prior: bool | jax.Array = True,
    include_td_rw: bool = True,
) -> NormalEqs:
    """Assemble H, g, and robustified cost at state x.

    ``include_td_rw``: the td random-walk anchor is a SOLVER-side prior
    (memory between windows); marginalization assemblies must exclude it
    (include_td_rw=False) or each margin step bakes the td innovation
    residual into r0, biasing the pose prior (measured: 0.6 m drift)."""
    dtype = x.p.dtype
    F = table.fid.shape[0]

    # --- IMU factors ---------------------------------------------------
    r_imu, J_imu = imu_res_jac(x, pre, imu_sqrt_info, params.gravity)
    w_imu = imu_valid.astype(dtype)[:, None]                     # (10,1)
    r_imu_w = r_imu * w_imu
    E = _imu_embed(dtype)                                        # (10,30,S)
    J_imu_s = jnp.einsum("aru,aus->ars", J_imu, E) * w_imu[..., None]
    H_imu = jnp.einsum("ari,arj->ij", J_imu_s, J_imu_s)
    g_imu = jnp.einsum("ari,ar->i", J_imu_s, r_imu_w)
    cost_imu = 0.5 * jnp.sum(r_imu_w * r_imu_w)

    # --- Projection factors --------------------------------------------
    r_p, J_p = proj_res_jac(x, table, ex_t, ex_q, params.sqrt_info_proj,
                            params.td_enable)
    w_cauchy = projection.cauchy_weight(r_p, params.cauchy_scale)  # (F, W)
    wv = (proj_valid.astype(dtype) * w_cauchy)[..., None]          # (F, W, 1)
    r_pw = r_p * wv
    # Split jacobian: anchor pose (6), target pose (6), ex (6), λ (1), td (1).
    J_a, J_t, J_ex, J_l, J_td = (J_p[..., 0:6], J_p[..., 6:12],
                                 J_p[..., 12:18], J_p[..., 18],
                                 J_p[..., 19:20])
    oh_a = jax.nn.one_hot(table.start, W, dtype=dtype)             # (F, 11)
    eye_w = jnp.eye(W, dtype=dtype)                                # (11, 11)
    # (F, W, 2, 11, 6): anchor block scattered by start, target by grid pos.
    J_pose = (J_a[:, :, :, None, :] * oh_a[:, None, None, :, None]
              + J_t[:, :, :, None, :] * eye_w[None, :, None, :, None])
    # Column order matches _proj_cols_index: [poses | td | extrinsic].
    J72 = jnp.concatenate(
        [J_pose.reshape(F, W, 2, layout.POSE_COLS), J_td, J_ex], axis=-1
    ) * wv[..., None]                                              # (F,W,2,73)
    J_lw = J_l * wv                                                # (F, W, 2)

    H72 = jnp.einsum("fwri,fwrj->ij", J72, J72)                    # (73, 73)
    g72 = jnp.einsum("fwri,fwr->i", J72, r_pw)
    H_sl72 = jnp.einsum("fwri,fwr->if", J72, J_lw)                 # (73, F)
    H_ll = jnp.einsum("fwr,fwr->f", J_lw, J_lw)                    # (F,)
    g_l = jnp.einsum("fwr,fwr->f", J_lw, r_pw)
    s_proj = jnp.sum(r_p * r_p, axis=-1)
    c2 = params.cauchy_scale * params.cauchy_scale
    rho = c2 * jnp.log1p(s_proj / c2)
    cost_proj = 0.5 * jnp.sum(rho * proj_valid.astype(dtype))

    cols = _proj_cols_index()
    H_ss = H_imu.at[jnp.ix_(cols, cols)].add(H72)
    g_s = g_imu.at[cols].add(g72)
    H_sl = jnp.zeros((S, F), dtype).at[cols].set(H_sl72)

    # --- Prior ---------------------------------------------------------
    dx0 = prior_dx(prior, x, ex_t, ex_q)
    r_prior = prior.r0 + prior.J0 @ dx0
    on = jnp.asarray(use_prior, dtype)
    H_ss = H_ss + on * prior_H0
    g_s = g_s + on * (prior.J0.T @ r_prior)
    cost_prior = 0.5 * on * jnp.sum(r_prior * r_prior)

    # --- td random walk (see SolverParams.td_rw_info) -------------------
    w_rw = params.td_rw_info * params.td_enable * (
        1.0 if include_td_rw else 0.0)
    tdc = layout.TD_COL
    r_td = x.td - prior.td0
    H_ss = H_ss.at[tdc, tdc].add(w_rw)
    g_s = g_s.at[tdc].add(w_rw * r_td)
    cost_td = 0.5 * w_rw * r_td * r_td

    return NormalEqs(
        H_ss=H_ss, g_s=g_s, H_sl=H_sl, H_ll=H_ll, g_l=g_l,
        cost=cost_imu + cost_proj + cost_prior + cost_td,
    )


def total_cost(
    x: XState,
    table: FeatureTable,
    pre: Preintegration,
    imu_sqrt_info: jax.Array,
    imu_valid: jax.Array,
    prior: Prior,
    ex_t: jax.Array, ex_q: jax.Array,
    params: SolverParams,
    proj_valid: jax.Array,
) -> jax.Array:
    """Robustified cost only (no Jacobians) — for LM accept/reject."""
    dtype = x.p.dtype

    def imu_one(i):
        x_i = (x.p[i], x.q[i], x.v[i], x.ba[i], x.bg[i])
        x_j = (x.p[i + 1], x.q[i + 1], x.v[i + 1], x.ba[i + 1], x.bg[i + 1])
        pre_leaf = tuple(leaf[i + 1] for leaf in pre)
        return _imu_residual_pert(
            jnp.zeros((30,), dtype), pre_leaf, x_i, x_j, imu_sqrt_info[i],
            params.gravity,
        )

    r_imu = jax.vmap(imu_one)(jnp.arange(W - 1))
    cost_imu = 0.5 * jnp.sum((r_imu * imu_valid.astype(dtype)[:, None]) ** 2)

    start = jnp.clip(table.start, 0, W - 1)
    ray_a = jnp.take_along_axis(table.obs, start[:, None, None], axis=1)[:, 0]
    vel_a = jnp.take_along_axis(table.vel, start[:, None, None], axis=1)[:, 0]
    r_p = projection.residual(
        ray_a[:, None, :], table.obs, x.lam[:, None],
        x.p[start][:, None, :], x.q[start][:, None, :],
        x.p[None, :, :], x.q[None, :, :],
        ex_t, ex_q, params.sqrt_info_proj,
        vel_i=vel_a[:, None, :], vel_j=table.vel, td=x.td,
    )
    s = jnp.sum(r_p * r_p, axis=-1)
    c2 = params.cauchy_scale * params.cauchy_scale
    cost_proj = 0.5 * jnp.sum(c2 * jnp.log1p(s / c2) * proj_valid.astype(dtype))

    dx0 = prior_dx(prior, x, ex_t, ex_q)
    r_prior = prior.r0 + prior.J0 @ dx0
    cost_prior = 0.5 * jnp.sum(r_prior * r_prior)
    r_td = x.td - prior.td0
    cost_td = 0.5 * params.td_rw_info * params.td_enable * r_td * r_td
    return cost_imu + cost_proj + cost_prior + cost_td


def td_grad_hess(x: XState, table: FeatureTable, ex_t: jax.Array,
                 ex_q: jax.Array, params: SolverParams,
                 proj_valid: jax.Array):
    """Gradient and Gauss-Newton curvature of the ROBUST projection cost
    w.r.t. td alone, everything else held at x.

    Basis of the decoupled td update (lm.optimize): td moves by the scalar
    GN step -g/h between solves, never inside the joint solve (where the
    (poses <-> time-shift) valley leaks it to the pose-absorbed solution).
    Returns (g, h, sum_w); h / sum_w is the mean per-observation curvature,
    which scales with (whitened feature speed)^2 — the estimator gates the
    update on it so td only moves under genuine motion excitation, where
    the time-offset direction separates from along-track pose drift."""
    dtype = x.p.dtype
    start = jnp.clip(table.start, 0, W - 1)
    ray_a = jnp.take_along_axis(table.obs, start[:, None, None], axis=1)[:, 0]
    vel_a = jnp.take_along_axis(table.vel, start[:, None, None], axis=1)[:, 0]

    def res_of_td(td):
        return projection.residual(
            ray_a[:, None, :], table.obs, x.lam[:, None],
            x.p[start][:, None, :], x.q[start][:, None, :],
            x.p[None, :, :], x.q[None, :, :],
            ex_t, ex_q, params.sqrt_info_proj,
            vel_i=vel_a[:, None, :], vel_j=table.vel, td=td,
        )

    r, dr = jax.jvp(res_of_td, (x.td,), (jnp.ones((), dtype),))
    w = projection.cauchy_weight(r, params.cauchy_scale) * proj_valid.astype(
        dtype)
    g = jnp.sum(w * jnp.sum(r * dr, axis=-1))
    h = jnp.sum(w * jnp.sum(dr * dr, axis=-1))
    return g, h, jnp.sum(w)
