"""Sliding-window VIO estimator core — the jitted per-frame steps.

TPU-native ``backend::Estimator`` (src/backend/estimator.cpp). The per-frame
work is split into three jitted device functions that the engine layer
composes, mirroring the reference call order inside processImage:

* ``bookkeeping_step``   — processIMU x batch + feature ingestion + keyframe
  decision (estimator.cpp:107-134, feature add at :140-152).
* ``solve_and_slide``    — solveOdometry (triangulate + optimize + gauge fix
  + marginalization) followed by the window/feature slide and failure
  removal (estimator.cpp:215-257, 288-340). NON_LINEAR only.
* ``initial_advance_or_slide`` — the INITIAL-phase frame_count++ or
  parallax-driven slide without marginalization (estimator.cpp:205-214).

The one-time SfM + visual-inertial alignment runs on host
(mobile_slam_tpu/init/), as in the reference where initialization is a cold
path. Divergence/NaN guards (estimator.cpp:218-251) are returned as
diagnostics; the engine layer performs resets (vio_engine.cpp:248-279).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import NUM_SLOTS, VIOConfig
from mobile_slam_tpu.factors import marginalization
from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov
from mobile_slam_tpu.frontend import feature_table as ft
from mobile_slam_tpu.imu import preintegration as pre
from mobile_slam_tpu.models.state import (
    FeatureTable,
    WindowState,
    init_feature_table,
    init_window,
)
from mobile_slam_tpu.solver import layout, lm
from mobile_slam_tpu.solver.assembly import Prior, SolverParams, XState, zero_prior
from mobile_slam_tpu.utils import rotations as rot

W = NUM_SLOTS


class EstimatorState(NamedTuple):
    window: WindowState
    table: FeatureTable
    prior: Prior
    prev_acc: jax.Array     # (3,) last IMU sample seen
    prev_gyr: jax.Array     # (3,)
    frame_count: jax.Array  # () int32, < W during INITIAL, == W-1-slot use
    first_imu_seen: jax.Array  # () bool
    # Camera-IMU time offset estimate (seconds). Solved jointly when
    # estimate_td is on (beyond the reference, which has no td state;
    # docs/analysis-report.md:408-418); otherwise frozen at td_init.
    td: jax.Array           # ()


class FrameInput(NamedTuple):
    """One camera frame + the IMU batch of its interval (push API payload,
    include/vio_engine.h:57-60)."""

    ts: jax.Array        # () seconds, rebased to sequence start
    ids: jax.Array       # (K,) int32
    obs: jax.Array       # (K, 3) unit-z rays
    uv: jax.Array        # (K, 2)
    vel: jax.Array       # (K, 2)
    valid: jax.Array     # (K,) bool
    imu_dt: jax.Array    # (M,)
    imu_acc: jax.Array   # (M, 3)
    imu_gyr: jax.Array   # (M, 3)
    imu_cnt: jax.Array   # () int32


class StepDiag(NamedTuple):
    is_keyframe: jax.Array
    culled_ids: jax.Array   # (F,) landmark ids rejected as outliers (-1 pad)
    last_track_num: jax.Array
    solver_cost0: jax.Array
    solver_cost: jax.Array
    accepted_steps: jax.Array
    vel_norm: jax.Array
    pos_norm: jax.Array
    state_finite: jax.Array
    # Median solved landmark depth — the engine's monocular-scale-runaway
    # gate watches this (depth inflation is the positive-feedback signature
    # of scale divergence: deeper scene -> larger apparent motion -> new
    # landmarks seeded deeper; observed to reach 100x silently).
    med_depth: jax.Array
    # Fresh-window td information + the gated-fusion gain applied this step
    # (zeros when estimate_td is off): observability telemetry for the
    # camera-IMU time-offset state.
    td_info: jax.Array
    td_gain: jax.Array


class StaticParams(NamedTuple):
    """Runtime-tunable scalars as device arrays (retuning never recompiles,
    replacing the reference's setMobileParams/setTrackingParams hooks,
    src/vio_engine.cpp:354-389)."""

    gravity: jax.Array          # (3,)
    ex_t: jax.Array             # (3,)
    ex_q: jax.Array             # (4,)
    sqrt_info_proj: jax.Array   # ()
    cauchy_scale: jax.Array     # ()
    init_depth: jax.Array       # ()
    min_parallax_norm: jax.Array  # () min_parallax / focal
    noise: jax.Array            # (18, 18) IMU noise covariance
    td_enable: jax.Array        # () 0/1: estimate camera-IMU time offset
    td_max: jax.Array           # () clamp on |td| (seconds)
    td_forget: jax.Array        # () prior-memory forgetting factor on td
    td_fuse_info: jax.Array     # () gated-fusion information constant
    td_gate_curv: jax.Array     # () per-obs curvature knee of the gate
    td_rw_info: jax.Array       # () in-solver random-walk anchor strength


def make_params(cfg: VIOConfig, dtype=jnp.float32) -> StaticParams:
    cam = cfg.camera
    est = cfg.estimator
    return StaticParams(
        gravity=jnp.asarray(est.gravity, dtype),
        ex_t=jnp.asarray(cam.t_ic_vec, dtype),
        ex_q=rot.rot_to_quat(jnp.asarray(cam.r_ic_mat, dtype)),
        sqrt_info_proj=jnp.asarray(cam.focal_length / 1.5, dtype),
        cauchy_scale=jnp.asarray(est.cauchy_scale, dtype),
        init_depth=jnp.asarray(est.init_depth, dtype),
        min_parallax_norm=jnp.asarray(est.min_parallax / cam.focal_length, dtype),
        noise=pre.make_noise_cov(est.acc_n, est.gyr_n, est.acc_w, est.gyr_w,
                                 dtype),
        td_enable=jnp.asarray(1.0 if est.estimate_td else 0.0, dtype),
        td_max=jnp.asarray(est.td_max, dtype),
        td_forget=jnp.asarray(est.td_prior_forget, dtype),
        td_fuse_info=jnp.asarray(est.td_fuse_info, dtype),
        td_gate_curv=jnp.asarray(est.td_gate_curv, dtype),
        td_rw_info=jnp.asarray(est.td_rw_info, dtype),
    )


def solver_params(p: StaticParams) -> SolverParams:
    return SolverParams(
        gravity=p.gravity,
        sqrt_info_proj=p.sqrt_info_proj,
        cauchy_scale=p.cauchy_scale,
        init_depth=p.init_depth,
        td_enable=p.td_enable,
        td_max=p.td_max,
        td_rw_info=p.td_rw_info,
    )


def init_state(cfg: VIOConfig, params: StaticParams,
               dtype=jnp.float32) -> EstimatorState:
    """clearState() parity (estimator.cpp:36-63)."""
    window = init_window(cfg.estimator.max_imu_per_interval, dtype)
    table = init_feature_table(cfg.estimator.max_features, dtype)
    td0 = cfg.estimator.td_init
    prior = zero_prior(params.ex_t, params.ex_q, dtype, td=td0)
    return EstimatorState(
        window=window, table=table, prior=prior,
        prev_acc=jnp.zeros(3, dtype), prev_gyr=jnp.zeros(3, dtype),
        frame_count=jnp.asarray(0, jnp.int32),
        first_imu_seen=jnp.asarray(False),
        td=jnp.asarray(td0, dtype),
    )


# ---------------------------------------------------------------------------
# IMU ingestion (processIMU, estimator.cpp:107-134)
# ---------------------------------------------------------------------------

def _continue_preintegration(carry: pre.Preintegration, stream_acc, stream_gyr,
                             dt, acc, gyr, count, noise) -> pre.Preintegration:
    """push_back() a batch onto an existing preintegration (a scan whose
    initial carry is the existing result)."""
    m = dt.shape[0]
    active = jnp.arange(m) < count
    init = (carry.dp, carry.dq, carry.dv, carry.jac, carry.cov, carry.sum_dt,
            stream_acc, stream_gyr)

    def step(c, i):
        return pre._midpoint_step(c, i, carry.lin_ba, carry.lin_bg, noise)

    (dp, dq, dv, jac, cov, sum_dt, _, _), _ = jax.lax.scan(
        step, init, (dt, acc, gyr, active), unroll=8 if m <= 32 else 1
    )
    return pre.Preintegration(dp, dq, dv, jac, cov, sum_dt,
                              carry.lin_ba, carry.lin_bg)


def ingest_imu(state: EstimatorState, inp: FrameInput,
               params: StaticParams) -> EstimatorState:
    """Preintegrate the frame's IMU batch into the current slot and propagate
    the slot state forward (processIMU + propagateIMUState)."""
    w = state.window
    fc = jnp.clip(state.frame_count, 0, W - 1)

    # First-ever IMU sample initializes prev_acc/prev_gyr (estimator.cpp:113-117).
    has_any = inp.imu_cnt > 0
    prev_acc = jnp.where(state.first_imu_seen, state.prev_acc, inp.imu_acc[0])
    prev_gyr = jnp.where(state.first_imu_seen, state.prev_gyr, inp.imu_gyr[0])

    # Continue (or start) the slot's preintegration with the new batch.
    slot_pre = jax.tree.map(lambda leaf: leaf[fc], w.pre)
    has_prev = w.imu_cnt[fc] > 0
    fresh = pre.identity_preintegration(w.ba[fc], w.bg[fc])
    carry_pre = jax.tree.map(
        lambda cur, new: jnp.where(has_prev, cur, new), slot_pre, fresh
    )
    acc0 = jnp.where(has_prev, w.imu_acc0[fc], prev_acc)
    gyr0 = jnp.where(has_prev, w.imu_gyr0[fc], prev_gyr)
    m = w.imu_dt.shape[1]
    last_idx = jnp.clip(w.imu_cnt[fc] - 1, 0, m - 1)
    stream_acc = jnp.where(has_prev, w.imu_acc[fc, last_idx], acc0)
    stream_gyr = jnp.where(has_prev, w.imu_gyr[fc, last_idx], gyr0)

    new_pre = pre.continue_preintegration_parallel(
        carry_pre, stream_acc, stream_gyr,
        inp.imu_dt, inp.imu_acc, inp.imu_gyr, inp.imu_cnt, params.noise,
    )
    # Frame 0 never integrates (estimator.cpp:126).
    skip = state.frame_count == 0
    new_pre = jax.tree.map(
        lambda new, old: jnp.where(skip, old, new), new_pre, slot_pre
    )

    # Append raw samples to the slot buffer (drop on overflow).
    idx = w.imu_cnt[fc] + jnp.arange(m)
    ok = (jnp.arange(m) < inp.imu_cnt) & (idx < m) & ~skip
    widx = jnp.where(ok, idx, m)
    imu_dt = w.imu_dt.at[fc, widx].set(inp.imu_dt, mode="drop")
    imu_acc = w.imu_acc.at[fc, widx].set(inp.imu_acc, mode="drop")
    imu_gyr = w.imu_gyr.at[fc, widx].set(inp.imu_gyr, mode="drop")
    new_cnt = jnp.where(skip, w.imu_cnt[fc],
                        jnp.minimum(w.imu_cnt[fc] + inp.imu_cnt, m))
    imu_cnt = w.imu_cnt.at[fc].set(new_cnt.astype(jnp.int32))
    imu_acc0 = w.imu_acc0.at[fc].set(acc0)
    imu_gyr0 = w.imu_gyr0.at[fc].set(gyr0)

    # World-state propagation of the current slot (skipped for frame 0).
    p_new, q_new, v_new, _, _ = pre.propagate_state_parallel(
        w.p[fc], w.q[fc], w.v[fc], w.ba[fc], w.bg[fc],
        prev_acc, prev_gyr,
        inp.imu_dt, inp.imu_acc, inp.imu_gyr, inp.imu_cnt, params.gravity,
    )
    # NaN guard (estimator.cpp:93-104).
    good = (jnp.all(jnp.isfinite(p_new)) & jnp.all(jnp.isfinite(q_new))
            & jnp.all(jnp.isfinite(v_new)) & ~skip)
    p_w = w.p.at[fc].set(jnp.where(good, p_new, w.p[fc]))
    q_w = w.q.at[fc].set(jnp.where(good, q_new, w.q[fc]))
    v_w = w.v.at[fc].set(jnp.where(good, v_new, w.v[fc]))

    last_i = jnp.clip(inp.imu_cnt - 1, 0, m - 1)
    prev_acc = jnp.where(has_any, inp.imu_acc[last_i], prev_acc)
    prev_gyr = jnp.where(has_any, inp.imu_gyr[last_i], prev_gyr)

    window = w._replace(
        p=p_w, q=q_w, v=v_w,
        pre=jax.tree.map(lambda full, one: full.at[fc].set(one), w.pre, new_pre),
        imu_dt=imu_dt, imu_acc=imu_acc, imu_gyr=imu_gyr, imu_cnt=imu_cnt,
        imu_acc0=imu_acc0, imu_gyr0=imu_gyr0,
    )
    return state._replace(
        window=window, prev_acc=prev_acc, prev_gyr=prev_gyr,
        first_imu_seen=state.first_imu_seen | has_any,
    )


def bookkeeping_step(
    state: EstimatorState,
    inp: FrameInput,
    params: StaticParams,
) -> tuple[EstimatorState, jax.Array]:
    """IMU ingestion + feature add + keyframe decision. Returns
    (state, is_keyframe). Shared by both solver phases."""
    state = ingest_imu(state, inp, params)
    fc = jnp.clip(state.frame_count, 0, W - 1)
    window = state.window._replace(ts=state.window.ts.at[fc].set(inp.ts))
    add = ft.add_and_check_parallax(
        state.table, inp.ids, inp.obs, inp.uv, inp.vel, inp.valid,
        fc, params.min_parallax_norm,
    )
    return state._replace(window=window, table=add.table), add.is_keyframe


# ---------------------------------------------------------------------------
# Window slides (slideWindow, estimator.cpp:288-340)
# ---------------------------------------------------------------------------

def _slide_window_old(w: WindowState, prev_acc, prev_gyr) -> WindowState:
    """Shift left; duplicate the newest frame into slot W-1 and open a fresh
    interval (slideWindowOldKeyframe, estimator.cpp:314-325)."""
    def shl(a):
        return jnp.concatenate([a[1:], a[-1:]], axis=0)  # new slot10 = old slot10

    new = WindowState(
        ts=shl(w.ts), p=shl(w.p), q=shl(w.q), v=shl(w.v),
        ba=shl(w.ba), bg=shl(w.bg),
        pre=jax.tree.map(shl, w.pre),
        imu_dt=shl(w.imu_dt), imu_acc=shl(w.imu_acc), imu_gyr=shl(w.imu_gyr),
        imu_cnt=shl(w.imu_cnt), imu_acc0=shl(w.imu_acc0),
        imu_gyr0=shl(w.imu_gyr0),
    )
    fresh = pre.identity_preintegration(new.ba[W - 1], new.bg[W - 1])
    return new._replace(
        pre=jax.tree.map(lambda full, one: full.at[W - 1].set(one),
                         new.pre, fresh),
        imu_dt=new.imu_dt.at[W - 1].set(0.0),
        imu_acc=new.imu_acc.at[W - 1].set(0.0),
        imu_gyr=new.imu_gyr.at[W - 1].set(0.0),
        imu_cnt=new.imu_cnt.at[W - 1].set(0),
        imu_acc0=new.imu_acc0.at[W - 1].set(prev_acc),
        imu_gyr0=new.imu_gyr0.at[W - 1].set(prev_gyr),
    )


def _slide_window_new(w: WindowState, prev_acc, prev_gyr,
                      noise: jax.Array) -> WindowState:
    """Merge the newest general frame into the previous interval
    (slideWindowNewGeneralFrame, estimator.cpp:298-312)."""
    m = w.imu_dt.shape[1]
    pre9 = jax.tree.map(lambda leaf: leaf[W - 2], w.pre)
    cnt9 = w.imu_cnt[W - 2]
    last9 = jnp.clip(cnt9 - 1, 0, m - 1)
    stream_acc = jnp.where(cnt9 > 0, w.imu_acc[W - 2, last9], w.imu_acc0[W - 2])
    stream_gyr = jnp.where(cnt9 > 0, w.imu_gyr[W - 2, last9], w.imu_gyr0[W - 2])
    merged = pre.continue_preintegration_parallel(
        pre9, stream_acc, stream_gyr,
        w.imu_dt[W - 1], w.imu_acc[W - 1], w.imu_gyr[W - 1], w.imu_cnt[W - 1],
        noise,
    )
    idx = cnt9 + jnp.arange(m)
    ok = (jnp.arange(m) < w.imu_cnt[W - 1]) & (idx < m)
    widx = jnp.where(ok, idx, m)
    imu_dt = w.imu_dt.at[W - 2, widx].set(w.imu_dt[W - 1], mode="drop")
    imu_acc = w.imu_acc.at[W - 2, widx].set(w.imu_acc[W - 1], mode="drop")
    imu_gyr = w.imu_gyr.at[W - 2, widx].set(w.imu_gyr[W - 1], mode="drop")
    new_cnt9 = jnp.minimum(cnt9 + w.imu_cnt[W - 1], m)

    new = w._replace(
        ts=w.ts.at[W - 2].set(w.ts[W - 1]),
        p=w.p.at[W - 2].set(w.p[W - 1]),
        q=w.q.at[W - 2].set(w.q[W - 1]),
        v=w.v.at[W - 2].set(w.v[W - 1]),
        ba=w.ba.at[W - 2].set(w.ba[W - 1]),
        bg=w.bg.at[W - 2].set(w.bg[W - 1]),
        pre=jax.tree.map(lambda full, one: full.at[W - 2].set(one),
                         w.pre, merged),
        imu_dt=imu_dt.at[W - 1].set(0.0),
        imu_acc=imu_acc.at[W - 1].set(0.0),
        imu_gyr=imu_gyr.at[W - 1].set(0.0),
        imu_cnt=w.imu_cnt.at[W - 2].set(new_cnt9.astype(jnp.int32))
        .at[W - 1].set(0),
        imu_acc0=w.imu_acc0.at[W - 1].set(prev_acc),
        imu_gyr0=w.imu_gyr0.at[W - 1].set(prev_gyr),
    )
    fresh = pre.identity_preintegration(new.ba[W - 1], new.bg[W - 1])
    return new._replace(
        pre=jax.tree.map(lambda full, one: full.at[W - 1].set(one),
                         new.pre, fresh)
    )


def _cam_pose(p, q, ex_t, ex_q):
    r_wb = rot.quat_to_rot(q)
    r_wc = r_wb @ rot.quat_to_rot(ex_q)
    t_wc = p + r_wb @ ex_t
    return r_wc, t_wc


# ---------------------------------------------------------------------------
# NON_LINEAR solve + slide (solveOdometry + slideWindow)
# ---------------------------------------------------------------------------

def solve_and_slide(
    state: EstimatorState,
    is_kf: jax.Array,
    params: StaticParams,
    num_iterations: int,
) -> tuple[EstimatorState, jax.Array, jax.Array, StepDiag]:
    """Triangulate, optimize, marginalize, slide. Returns
    (state, body_p (3,), body_q (4,), diag) where the pose is the newest
    window frame after optimization — what the reference logs per frame
    (vio_system.cpp:248-295)."""
    w = state.window
    table = ft.triangulate(state.table, w.p, w.q, params.ex_t, params.ex_q,
                           params.init_depth, td=state.td)
    sp = solver_params(params)
    w, table, res, culled_ids = lm.optimize(
        w, table, state.prior, params.ex_t, params.ex_q, sp, num_iterations,
        td0=state.td,
    )

    # Observability-gated td fusion: the solve measures td from the window
    # alone (the prior's td column is cleared below), and the estimate
    # moves by gain I_w / (I_w + C). Under locally-constant velocity the
    # window's td information I_w collapses (the anchor-depth lift absorbs
    # a first-order time shift; scripts/dev_td_data_probe.py) and an
    # ungated joint estimate drifts to zero even from a truth init
    # (scripts/dev_td_probe.py --init 10) — the gate holds td through
    # those stretches and converges fast under excitation.
    i_w = jnp.maximum(res.td_info, 0.0)
    # Excitation gate: mean per-observation td curvature i_w / wsum scales
    # with (whitened feature speed)^2. Below the knee (td_gate_curv) the
    # time-offset direction is indistinguishable from along-track pose
    # drift and the scalar estimate drains toward the pose-absorbed value
    # (dev_td_probe.py), so updates are quadratically suppressed; above it
    # the gate saturates to 1 and convergence runs at the fusion gain.
    curv = i_w / jnp.maximum(res.td_wsum, 1.0)
    sgate = curv / jnp.maximum(params.td_gate_curv, 1e-6)
    gate = sgate * sgate / (1.0 + sgate * sgate)
    gain = gate * jnp.where(i_w + params.td_fuse_info > 0,
                            i_w / (i_w + params.td_fuse_info), 0.0)
    td_fused = jnp.where(
        params.td_enable > 0,
        jnp.clip(state.td + gain * res.td_innov,
                 -params.td_max, params.td_max),
        state.td)

    # Marginalization at the post-gauge-fix state.
    x_post = XState(p=w.p, q=w.q, v=w.v, ba=w.ba, bg=w.bg, lam=res.x.lam,
                    td=td_fused)
    imu_sqrt_info = sqrt_info_from_cov(w.pre.cov[1:])

    prior = jax.lax.cond(
        is_kf,
        lambda _: marginalization.marginalize_old(
            x_post, table, w, imu_sqrt_info, state.prior,
            params.ex_t, params.ex_q, sp,
        ),
        lambda _: marginalization.marginalize_new(
            x_post, state.prior, params.ex_t, params.ex_q
        ),
        None,
    )
    # Bounded prior memory on the td calibration state: full FEJ memory
    # anchors td at its early (wrong) linearization (see
    # config.EstimatorConfig.td_prior_forget and scripts/dev_td_probe.py);
    # scaling the prior's td column after each marginalization keeps an
    # effective ~1/(1-gamma^2)-frame memory. No-op when td is disabled
    # (the column is identically zero then).
    prior = prior._replace(
        J0=prior.J0.at[:, layout.TD_COL].multiply(params.td_forget))

    r0_wc, t0_wc = _cam_pose(w.p[0], w.q[0], params.ex_t, params.ex_q)
    r1_wc, t1_wc = _cam_pose(w.p[1], w.q[1], params.ex_t, params.ex_q)

    def slide_kf(_):
        return (
            _slide_window_old(w, state.prev_acc, state.prev_gyr),
            ft.slide_old(table, True, r0_wc, t0_wc, r1_wc, t1_wc,
                         params.init_depth, td=td_fused),
        )

    def slide_general(_):
        return (
            _slide_window_new(w, state.prev_acc, state.prev_gyr, params.noise),
            ft.slide_new(table),
        )

    w2, table2 = jax.lax.cond(is_kf, slide_kf, slide_general, None)
    table2 = ft.remove_failures(table2)

    solved = (table.fid >= 0) & (table.solve_flag == 1) & (table.depth > 0)
    dep_sorted = jnp.sort(jnp.where(solved, table.depth, jnp.inf))
    n_solved = jnp.sum(solved)
    med_depth = jnp.where(
        n_solved > 0,
        dep_sorted[jnp.clip(n_solved // 2, 0, table.depth.shape[0] - 1)],
        0.0,
    )

    # Tracked-feature count for the current frame (the reference's
    # getFeaturePointCount diagnostic, vio_engine.cpp:313-352): slots
    # observed in the newest frame with a track length >= 2. Masks within
    # a track are contiguous from `start`, so used_num >= 2 with a
    # current-frame observation means tracked-from-before.
    fc_cur = jnp.clip(state.frame_count, 0, W - 1)
    cur_mask = jnp.take(state.table.mask, fc_cur, axis=1)
    n_tracked = jnp.sum((state.table.fid >= 0) & cur_mask
                        & (state.table.used_num >= 2)).astype(jnp.int32)

    diag = StepDiag(
        is_keyframe=is_kf,
        culled_ids=culled_ids,
        last_track_num=n_tracked,
        solver_cost0=res.cost0,
        solver_cost=res.cost,
        accepted_steps=res.accepted,
        vel_norm=jnp.linalg.norm(w.v[W - 1]),
        pos_norm=jnp.linalg.norm(w.p[W - 1]),
        state_finite=jnp.all(jnp.isfinite(w.p)) & jnp.all(jnp.isfinite(w.v))
        & jnp.all(jnp.isfinite(w.q)),
        med_depth=med_depth,
        td_info=res.td_info,
        td_gain=gain * params.td_enable,
    )
    new_state = state._replace(window=w2, table=table2, prior=prior,
                               td=td_fused)
    return new_state, w.p[W - 1], w.q[W - 1], diag


# ---------------------------------------------------------------------------
# Initialization injection (visualInitialAlign, initializer.cpp:348-424)
# ---------------------------------------------------------------------------

def repropagate_window(window: WindowState, ba: jax.Array, bg: jax.Array,
                       noise: jax.Array) -> WindowState:
    """Re-run every slot's preintegration with new linearization biases from
    the stored raw buffers (IntegrationBase::repropagate for the whole
    window, initializer.cpp:382-384)."""
    def one(acc0, gyr0, dt, acc, gyr, cnt):
        return pre.preintegrate_parallel(acc0, gyr0, dt, acc, gyr, cnt,
                                         ba, bg, noise)

    new_pre = jax.vmap(one)(
        window.imu_acc0, window.imu_gyr0, window.imu_dt, window.imu_acc,
        window.imu_gyr, window.imu_cnt,
    )
    return window._replace(pre=new_pre)


def apply_initialization(
    state: EstimatorState,
    p_cam: jax.Array,     # (11, 3) SfM camera positions (scale-free, l-frame)
    q_body: jax.Array,    # (11, 4) body orientations (l-frame)
    v_world: jax.Array,   # (11, 3) body-frame-rotated velocities R_i x_i
    bg: jax.Array,        # (3,)
    gravity_l: jax.Array, # (3,) gravity estimate in the l-frame
    scale: jax.Array,     # ()
    params: StaticParams,
) -> tuple[EstimatorState, jax.Array]:
    """Write the initialization solution into the window and landmark bank,
    then rotate everything into the gravity-aligned yaw-zeroed world frame.
    Returns (state, world gravity vector)."""
    dtype = state.window.p.dtype
    w = state.window._replace(
        p=p_cam.astype(dtype),
        q=q_body.astype(dtype),
        ba=jnp.zeros((W, 3), dtype),
        bg=jnp.tile(bg.astype(dtype), (W, 1)),
    )

    # Reset depths, re-triangulate on camera poses with t_ic = 0
    # (initializer.cpp:369-376).
    table = state.table
    used = table.fid >= 0
    table = table._replace(
        depth=jnp.where(used, -1.0, table.depth),
        solve_flag=jnp.where(used, 0, table.solve_flag),
    )
    table = ft.triangulate(
        table, w.p, w.q, jnp.zeros(3, dtype), params.ex_q, params.init_depth
    )

    # Repropagate with the estimated gyro bias (:382-384).
    w = repropagate_window(w, jnp.zeros(3, dtype), bg.astype(dtype),
                           params.noise)

    # Metric rescale + shift to the first keyframe's body origin (:386-390).
    r_wb = rot.quat_to_rot(w.q)
    body_off = jnp.einsum("wij,j->wi", r_wb, params.ex_t)
    p_metric = scale * w.p - body_off
    p_metric = p_metric - p_metric[0:1]
    w = w._replace(p=p_metric.astype(dtype), v=v_world.astype(dtype))

    # Scale landmark depths (:402-407).
    from mobile_slam_tpu.models.state import eligible_mask as _elig
    elig = _elig(table)
    table = table._replace(
        depth=jnp.where(elig, table.depth * scale, table.depth)
    )

    # Gravity-aligned, yaw-zeroed world frame (:409-421).
    r0 = rot.g2r(gravity_l.astype(dtype))
    yaw = rot.r2ypr(r0 @ rot.quat_to_rot(w.q[0]))[0]
    r0 = rot.ypr2r(jnp.stack([-yaw, jnp.zeros_like(yaw),
                              jnp.zeros_like(yaw)])) @ r0
    g_world = r0 @ gravity_l.astype(dtype)
    q_r0 = rot.rot_to_quat(r0)
    w = w._replace(
        p=w.p @ r0.T,
        q=rot.quat_normalize(rot.quat_mul(q_r0[None, :], w.q)),
        v=w.v @ r0.T,
    )
    return state._replace(window=w, table=table), g_world


# ---------------------------------------------------------------------------
# INITIAL-phase advance/slide (estimator.cpp:205-214)
# ---------------------------------------------------------------------------

def initial_advance_or_slide(
    state: EstimatorState,
    is_kf: jax.Array,
    params: StaticParams,
) -> EstimatorState:
    """When the window is not full, advance frame_count (seeding the next
    slot with the current state so IMU propagation continues from the latest
    pose). When full (host init attempt failed), slide by parallax without
    marginalization."""
    w = state.window
    fc = state.frame_count
    full = fc >= (W - 1)

    def advance(_):
        nfc = jnp.clip(fc + 1, 0, W - 1)
        w2 = w._replace(
            p=w.p.at[nfc].set(w.p[fc]),
            q=w.q.at[nfc].set(w.q[fc]),
            v=w.v.at[nfc].set(w.v[fc]),
            ba=w.ba.at[nfc].set(w.ba[fc]),
            bg=w.bg.at[nfc].set(w.bg[fc]),
        )
        return w2, state.table, fc + 1

    def slide(_):
        def kf_slide(_):
            r0_wc, t0_wc = _cam_pose(w.p[0], w.q[0], params.ex_t, params.ex_q)
            r1_wc, t1_wc = _cam_pose(w.p[1], w.q[1], params.ex_t, params.ex_q)
            return (
                _slide_window_old(w, state.prev_acc, state.prev_gyr),
                ft.slide_old(state.table, False, r0_wc, t0_wc, r1_wc, t1_wc,
                             params.init_depth, td=state.td),
            )

        def gen_slide(_):
            return (
                _slide_window_new(w, state.prev_acc, state.prev_gyr,
                                  params.noise),
                ft.slide_new(state.table),
            )

        w2, t2 = jax.lax.cond(is_kf, kf_slide, gen_slide, None)
        return w2, t2, fc

    w2, table2, fc2 = jax.lax.cond(full, slide, advance, None)
    return state._replace(window=w2, table=table2, frame_count=fc2)
