"""IMU preintegration as a masked lax.scan (TPU-native).

Functional equivalent of the reference ``IntegrationBase``
(include/backend/factor/integration_base.h): midpoint integration of
(Δp, Δq, Δv) between consecutive camera frames, the 15x15 first-order bias
Jacobian, and the 15x15 covariance propagated through an 18x18 noise model
(integration_base.h:66-133). ``repropagate`` is the same scan re-run with new
linearization biases (integration_base.h:51-64). State ordering follows
StateOrder O_P/O_R/O_V/O_BA/O_BG (utility/config.h).

Everything is dtype-polymorphic and shape-static: an interval holds up to
``M`` readings, with a count-mask making extra slots no-ops, so the scan jits
once for all frames.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.config import O_BA, O_BG, O_P, O_R, O_V
from mobile_slam_tpu.utils import rotations as rot


class Preintegration(NamedTuple):
    """Result of preintegrating one camera-frame interval.

    All leaves carry arbitrary leading batch dims so a whole window (or a
    batch of sequences) can be preintegrated with one vmap.
    """

    dp: jax.Array        # (..., 3)   Δp
    dq: jax.Array        # (..., 4)   Δq (wxyz)
    dv: jax.Array        # (..., 3)   Δv
    jac: jax.Array       # (..., 15, 15) first-order bias Jacobian
    cov: jax.Array       # (..., 15, 15) covariance
    sum_dt: jax.Array    # (...,)
    lin_ba: jax.Array    # (..., 3)   linearization accel bias
    lin_bg: jax.Array    # (..., 3)   linearization gyro bias


def make_noise_cov(acc_n: float, gyr_n: float, acc_w: float, gyr_w: float,
                   dtype=jnp.float32) -> jax.Array:
    """18x18 diagonal noise covariance (integration_base.h:35-41)."""
    diag = jnp.concatenate([
        jnp.full((3,), acc_n * acc_n, dtype=dtype),
        jnp.full((3,), gyr_n * gyr_n, dtype=dtype),
        jnp.full((3,), acc_n * acc_n, dtype=dtype),
        jnp.full((3,), gyr_n * gyr_n, dtype=dtype),
        jnp.full((3,), acc_w * acc_w, dtype=dtype),
        jnp.full((3,), gyr_w * gyr_w, dtype=dtype),
    ])
    return jnp.diag(diag)


def identity_preintegration(ba: jax.Array, bg: jax.Array) -> Preintegration:
    """Freshly-constructed (empty) interval — IntegrationBase ctor parity."""
    dtype = ba.dtype
    return Preintegration(
        dp=jnp.zeros(3, dtype),
        dq=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        dv=jnp.zeros(3, dtype),
        jac=jnp.eye(15, dtype=dtype),
        cov=jnp.zeros((15, 15), dtype),
        sum_dt=jnp.zeros((), dtype),
        lin_ba=ba,
        lin_bg=bg,
    )


def _midpoint_step(carry, inp, lin_ba, lin_bg, noise):
    """One midpoint-integration step (integration_base.h:66-133)."""
    dp, dq, dv, jac, cov, sum_dt, acc_0, gyr_0 = carry
    dt, acc_1, gyr_1, active = inp
    dtype = dp.dtype

    un_acc_0 = rot.quat_rotate(dq, acc_0 - lin_ba)
    un_gyr = 0.5 * (gyr_0 + gyr_1) - lin_bg
    r_dq = rot.quat_mul(dq, rot.delta_q(un_gyr * dt))
    un_acc_1 = rot.quat_rotate(r_dq, acc_1 - lin_ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    r_dp = dp + dv * dt + 0.5 * un_acc * dt * dt
    r_dv = dv + un_acc * dt

    # Jacobian / covariance propagation.
    r_w = rot.skew(un_gyr)
    r_a0 = rot.skew(acc_0 - lin_ba)
    r_a1 = rot.skew(acc_1 - lin_ba)
    R0 = rot.quat_to_rot(dq)
    R1 = rot.quat_to_rot(r_dq)
    eye3 = jnp.eye(3, dtype=dtype)
    dt2 = dt * dt

    F = jnp.zeros((15, 15), dtype)
    F = F.at[O_P:O_P+3, O_P:O_P+3].set(eye3)
    F = F.at[O_P:O_P+3, O_R:O_R+3].set(
        -0.25 * R0 @ r_a0 * dt2 - 0.25 * R1 @ r_a1 @ (eye3 - r_w * dt) * dt2
    )
    F = F.at[O_P:O_P+3, O_V:O_V+3].set(eye3 * dt)
    F = F.at[O_P:O_P+3, O_BA:O_BA+3].set(-0.25 * (R0 + R1) * dt2)
    F = F.at[O_P:O_P+3, O_BG:O_BG+3].set(0.25 * R1 @ r_a1 * dt2 * dt)
    F = F.at[O_R:O_R+3, O_R:O_R+3].set(eye3 - r_w * dt)
    F = F.at[O_R:O_R+3, O_BG:O_BG+3].set(-eye3 * dt)
    F = F.at[O_V:O_V+3, O_R:O_R+3].set(
        -0.5 * R0 @ r_a0 * dt - 0.5 * R1 @ r_a1 @ (eye3 - r_w * dt) * dt
    )
    F = F.at[O_V:O_V+3, O_V:O_V+3].set(eye3)
    F = F.at[O_V:O_V+3, O_BA:O_BA+3].set(-0.5 * (R0 + R1) * dt)
    F = F.at[O_V:O_V+3, O_BG:O_BG+3].set(0.5 * R1 @ r_a1 * dt * dt)
    F = F.at[O_BA:O_BA+3, O_BA:O_BA+3].set(eye3)
    F = F.at[O_BG:O_BG+3, O_BG:O_BG+3].set(eye3)

    V = jnp.zeros((15, 18), dtype)
    v03 = -0.125 * R1 @ r_a1 * dt2 * dt  # 0.25 * (-R1 r_a1) * dt2 * 0.5 * dt
    V = V.at[O_P:O_P+3, 0:3].set(0.25 * R0 * dt2)
    V = V.at[O_P:O_P+3, 3:6].set(v03)
    V = V.at[O_P:O_P+3, 6:9].set(0.25 * R1 * dt2)
    V = V.at[O_P:O_P+3, 9:12].set(v03)
    V = V.at[O_R:O_R+3, 3:6].set(0.5 * eye3 * dt)
    V = V.at[O_R:O_R+3, 9:12].set(0.5 * eye3 * dt)
    v63 = -0.25 * R1 @ r_a1 * dt * dt
    V = V.at[O_V:O_V+3, 0:3].set(0.5 * R0 * dt)
    V = V.at[O_V:O_V+3, 3:6].set(v63)
    V = V.at[O_V:O_V+3, 6:9].set(0.5 * R1 * dt)
    V = V.at[O_V:O_V+3, 9:12].set(v63)
    V = V.at[O_BA:O_BA+3, 12:15].set(eye3 * dt)
    V = V.at[O_BG:O_BG+3, 15:18].set(eye3 * dt)

    r_jac = F @ jac
    r_cov = F @ cov @ F.T + V @ noise @ V.T
    r_dq = rot.quat_normalize(r_dq)  # propagate() normalizes after each step
    r_sum_dt = sum_dt + dt

    # Masked update: inactive slots leave the carry untouched.
    def sel(new, old):
        return jnp.where(active, new, old)

    carry = (
        sel(r_dp, dp), sel(r_dq, dq), sel(r_dv, dv),
        sel(r_jac, jac), sel(r_cov, cov), sel(r_sum_dt, sum_dt),
        sel(acc_1, acc_0), sel(gyr_1, gyr_0),
    )
    return carry, None


def preintegrate(
    acc0: jax.Array,          # (3,) measurement at interval start (linearized_acc)
    gyr0: jax.Array,          # (3,)
    dt: jax.Array,            # (M,)
    acc: jax.Array,           # (M, 3)
    gyr: jax.Array,           # (M, 3)
    count: jax.Array,         # () int — number of valid readings
    lin_ba: jax.Array,        # (3,)
    lin_bg: jax.Array,        # (3,)
    noise: jax.Array,         # (18, 18)
) -> Preintegration:
    """Preintegrate one interval. Equivalent to constructing IntegrationBase
    (acc0, gyr0, ba, bg) then push_back-ing the ``count`` valid readings.

    Re-running with different (lin_ba, lin_bg) is exactly ``repropagate``.
    """
    dtype = acc0.dtype
    m = dt.shape[0]
    active = jnp.arange(m) < count

    init = (
        jnp.zeros(3, dtype),
        jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype),
        jnp.zeros((15, 15), dtype),
        jnp.zeros((), dtype),
        acc0,
        gyr0,
    )

    def step(carry, inp):
        return _midpoint_step(carry, inp, lin_ba, lin_bg, noise)

    (dp, dq, dv, jac, cov, sum_dt, _, _), _ = jax.lax.scan(
        step, init, (dt, acc, gyr, active), unroll=8 if m <= 32 else 1
    )
    return Preintegration(dp, dq, dv, jac, cov, sum_dt, lin_ba, lin_bg)


def _step_quantities(acc0, gyr0, dt, acc, gyr, count, lin_ba, lin_bg):
    """Per-step measurement-only quantities for the parallel-prefix
    formulation: previous-sample arrays, midpoint rates, delta-quaternions."""
    m = dt.shape[0]
    active = (jnp.arange(m) < count)
    acc_prev = jnp.concatenate([acc0[None], acc[:-1]], axis=0)
    gyr_prev = jnp.concatenate([gyr0[None], gyr[:-1]], axis=0)
    un_gyr = 0.5 * (gyr_prev + gyr) - lin_bg
    dq_step = rot.delta_q(un_gyr * dt[:, None])
    ident = jnp.asarray([1.0, 0, 0, 0], dq_step.dtype)
    dq_step = jnp.where(active[:, None], dq_step, ident)
    return active, acc_prev, gyr_prev, un_gyr, dq_step


def preintegrate_parallel(
    acc0: jax.Array, gyr0: jax.Array,
    dt: jax.Array, acc: jax.Array, gyr: jax.Array,
    count: jax.Array, lin_ba: jax.Array, lin_bg: jax.Array,
    noise: jax.Array,
) -> Preintegration:
    """Parallel-prefix preintegration — same math as ``preintegrate`` but
    restructured for the TPU: the sequential per-sample loop becomes

      1. an associative scan of quaternion products (rotation chain),
      2. cumulative sums for Δv/Δp (the mid-point accelerations only depend
         on the now-known prefix rotations),
      3. an associative scan of (F, W) affine pairs for the bias Jacobian
         and covariance — batched 15x15 matmuls at log2(M) depth on the MXU
         instead of M dependent steps on the VPU.

    Numerically identical to the reference recursion up to the deferred
    quaternion normalization (the reference normalizes each step; here the
    prefix products are normalized once, an O(1e-7) difference)."""
    dtype = acc0.dtype
    m = dt.shape[0]
    active, acc_prev, gyr_prev, un_gyr, dq_step = _step_quantities(
        acc0, gyr0, dt, acc, gyr, count, lin_ba, lin_bg)
    dt_m = jnp.where(active, dt, 0.0)

    # 1. Rotation prefix chain.
    q_prefix = jax.lax.associative_scan(rot.quat_mul, dq_step)  # (M, 4)
    q_prefix = rot.quat_normalize(q_prefix)
    R = rot.quat_to_rot(q_prefix)                               # (M, 3, 3)
    ident_q = jnp.asarray([1.0, 0, 0, 0], dtype)
    q_prev = jnp.concatenate([ident_q[None], q_prefix[:-1]], axis=0)
    R_prev = rot.quat_to_rot(q_prev)

    # 2. Velocity / position prefix sums.
    a_prev_b = jnp.einsum("mij,mj->mi", R_prev, acc_prev - lin_ba)
    a_cur_b = jnp.einsum("mij,mj->mi", R, acc - lin_ba)
    un_acc = jnp.where(active[:, None], 0.5 * (a_prev_b + a_cur_b), 0.0)
    dv_inc = un_acc * dt_m[:, None]
    dv = jnp.cumsum(dv_inc, axis=0)
    dv_prev = jnp.concatenate([jnp.zeros((1, 3), dtype), dv[:-1]], axis=0)
    dp_inc = dv_prev * dt_m[:, None] + 0.5 * un_acc * dt_m[:, None] ** 2
    dp = jnp.cumsum(dp_inc, axis=0)

    # 3. Batched F / W, then affine-pair prefix composition.
    w_x = jnp.where(active[:, None], un_gyr, 0.0)
    r_w = rot.skew(w_x)
    r_a0 = rot.skew(acc_prev - lin_ba)
    r_a1 = rot.skew(acc - lin_ba)
    eye3 = jnp.eye(3, dtype=dtype)
    dtc = dt_m[:, None, None]
    dt2 = dtc * dtc

    def blk(F, r0, c0, val):
        return F.at[:, r0:r0 + 3, c0:c0 + 3].set(val)

    I_left = eye3[None] - r_w * dtc
    F = jnp.zeros((m, 15, 15), dtype)
    F = blk(F, O_P, O_P, jnp.broadcast_to(eye3, (m, 3, 3)))
    F = blk(F, O_P, O_R,
            -0.25 * (R_prev @ r_a0) * dt2 - 0.25 * (R @ r_a1 @ I_left) * dt2)
    F = blk(F, O_P, O_V, eye3[None] * dtc)
    F = blk(F, O_P, O_BA, -0.25 * (R_prev + R) * dt2)
    F = blk(F, O_P, O_BG, 0.25 * (R @ r_a1) * dt2 * dtc)
    F = blk(F, O_R, O_R, I_left)
    F = blk(F, O_R, O_BG, -eye3[None] * dtc)
    F = blk(F, O_V, O_R,
            -0.5 * (R_prev @ r_a0) * dtc - 0.5 * (R @ r_a1 @ I_left) * dtc)
    F = blk(F, O_V, O_V, jnp.broadcast_to(eye3, (m, 3, 3)))
    F = blk(F, O_V, O_BA, -0.5 * (R_prev + R) * dtc)
    F = blk(F, O_V, O_BG, 0.5 * (R @ r_a1) * dtc * dtc)
    F = blk(F, O_BA, O_BA, jnp.broadcast_to(eye3, (m, 3, 3)))
    F = blk(F, O_BG, O_BG, jnp.broadcast_to(eye3, (m, 3, 3)))
    # Inactive steps: F = I (blocks above already use dt=0 -> I, except the
    # O_R diagonal which uses masked w_x -> I as well).

    V = jnp.zeros((m, 15, 18), dtype)

    def vblk(Vm, r0, c0, val):
        return Vm.at[:, r0:r0 + 3, c0:c0 + 3].set(val)

    v03 = -0.125 * (R @ r_a1) * dt2 * dtc
    V = vblk(V, O_P, 0, 0.25 * R_prev * dt2)
    V = vblk(V, O_P, 3, v03)
    V = vblk(V, O_P, 6, 0.25 * R * dt2)
    V = vblk(V, O_P, 9, v03)
    V = vblk(V, O_R, 3, 0.5 * eye3[None] * dtc)
    V = vblk(V, O_R, 9, 0.5 * eye3[None] * dtc)
    v63 = -0.25 * (R @ r_a1) * dtc * dtc
    V = vblk(V, O_V, 0, 0.5 * R_prev * dtc)
    V = vblk(V, O_V, 3, v63)
    V = vblk(V, O_V, 6, 0.5 * R * dtc)
    V = vblk(V, O_V, 9, v63)
    V = vblk(V, O_BA, 12, eye3[None] * dtc)
    V = vblk(V, O_BG, 15, eye3[None] * dtc)
    W_step = V @ noise @ jnp.swapaxes(V, -1, -2)

    def combine(x, y):
        Fx, Wx = x
        Fy, Wy = y
        return Fy @ Fx, Fy @ Wx @ jnp.swapaxes(Fy, -1, -2) + Wy

    jac_prefix, cov_prefix = jax.lax.associative_scan(combine, (F, W_step))

    last = jnp.clip(count - 1, 0, m - 1)
    empty = count <= 0
    sel = lambda arr, ident: jnp.where(empty, ident, arr[last])
    return Preintegration(
        dp=sel(dp, jnp.zeros(3, dtype)),
        dq=sel(q_prefix, jnp.asarray([1.0, 0, 0, 0], dtype)),
        dv=sel(dv, jnp.zeros(3, dtype)),
        jac=sel(jac_prefix, jnp.eye(15, dtype=dtype)),
        cov=sel(cov_prefix, jnp.zeros((15, 15), dtype)),
        sum_dt=jnp.sum(dt_m),
        lin_ba=lin_ba,
        lin_bg=lin_bg,
    )


def continue_preintegration_parallel(
    carry: Preintegration, stream_acc, stream_gyr,
    dt, acc, gyr, count, noise,
) -> Preintegration:
    """push_back() a batch onto an existing preintegration using the
    parallel-prefix kernel: segment composition.

    With segment A = carry and segment B = the new batch (preintegrated
    standalone, i.e. rotations relative to B's start), the sequential
    recursion factors as

        dq  = dq_A ⊗ dq_B
        dv  = dv_A + R_A dv_B
        dp  = dp_A + dv_A T_B + R_A dp_B
        F_i(in-chain) = T F_i(standalone) Tᵀ,  T = blkdiag(R_A, I, R_A, I, I)
        jac = T J_B Tᵀ · J_A
        cov = (T J_B Tᵀ) cov_A (T J_B Tᵀ)ᵀ + T cov_B Tᵀ

    because the only interval-start-frame quantity inside each step's F/V is
    the prefix rotation, which left-multiplies by R_A on the p and v rows.
    """
    dtype = carry.dp.dtype
    inc = preintegrate_parallel(stream_acc, stream_gyr, dt, acc, gyr, count,
                                carry.lin_ba, carry.lin_bg, noise)
    R_c = rot.quat_to_rot(carry.dq)
    dq = rot.quat_normalize(rot.quat_mul(carry.dq, inc.dq))
    dv = carry.dv + R_c @ inc.dv
    dp = carry.dp + carry.dv * inc.sum_dt + R_c @ inc.dp

    T = jnp.eye(15, dtype=dtype)
    T = T.at[O_P:O_P+3, O_P:O_P+3].set(R_c)
    T = T.at[O_V:O_V+3, O_V:O_V+3].set(R_c)
    J_B_chain = T @ inc.jac @ T.T
    jac = J_B_chain @ carry.jac
    cov = J_B_chain @ carry.cov @ J_B_chain.T + T @ inc.cov @ T.T
    return Preintegration(dp=dp, dq=dq, dv=dv, jac=jac, cov=cov,
                          sum_dt=carry.sum_dt + inc.sum_dt,
                          lin_ba=carry.lin_ba, lin_bg=carry.lin_bg)


def propagate_state_parallel(
    p: jax.Array, q: jax.Array, v: jax.Array, ba: jax.Array, bg: jax.Array,
    prev_acc: jax.Array, prev_gyr: jax.Array,
    dt: jax.Array, acc: jax.Array, gyr: jax.Array, count: jax.Array,
    gravity: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Parallel-prefix version of ``propagate_state`` (same trapezoidal
    world-frame integration, log-depth)."""
    dtype = p.dtype
    m = dt.shape[0]
    active, acc_prev, gyr_prev, un_gyr, dq_step = _step_quantities(
        prev_acc, prev_gyr, dt, acc, gyr, count, jnp.zeros(3, dtype), bg)
    dt_m = jnp.where(active, dt, 0.0)

    q_prefix = jax.lax.associative_scan(rot.quat_mul, dq_step)
    q_all = rot.quat_normalize(rot.quat_mul(q[None, :], q_prefix))
    q_prev_all = jnp.concatenate([q[None], q_all[:-1]], axis=0)

    a_prev = rot.quat_rotate(q_prev_all, acc_prev - ba) - gravity
    a_cur = rot.quat_rotate(q_all, acc - ba) - gravity
    un_acc = jnp.where(active[:, None], 0.5 * (a_prev + a_cur), 0.0)
    dv_inc = un_acc * dt_m[:, None]
    v_all = v[None] + jnp.cumsum(dv_inc, axis=0)
    v_prev_all = jnp.concatenate([v[None], v_all[:-1]], axis=0)
    dp_inc = v_prev_all * dt_m[:, None] + 0.5 * un_acc * dt_m[:, None] ** 2
    p_all = p[None] + jnp.cumsum(dp_inc, axis=0)

    last = jnp.clip(count - 1, 0, m - 1)
    empty = count <= 0
    p_out = jnp.where(empty, p, p_all[last])
    q_out = jnp.where(empty, q, q_all[last])
    v_out = jnp.where(empty, v, v_all[last])
    acc_out = jnp.where(empty, prev_acc, acc[last])
    gyr_out = jnp.where(empty, prev_gyr, gyr[last])
    return p_out, q_out, v_out, acc_out, gyr_out


def propagate_state(
    p: jax.Array, q: jax.Array, v: jax.Array, ba: jax.Array, bg: jax.Array,
    prev_acc: jax.Array, prev_gyr: jax.Array,
    dt: jax.Array, acc: jax.Array, gyr: jax.Array, count: jax.Array,
    gravity: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """World-frame forward propagation of the window-tip state across new IMU
    readings — parity with ``Estimator::propagateIMUState``
    (src/backend/estimator.cpp:65-105): trapezoidal acceleration, midpoint
    gyro. Returns (p, q, v, last_acc, last_gyr)."""
    m = dt.shape[0]
    active = jnp.arange(m) < count

    def step(carry, inp):
        p, q, v, acc_0, gyr_0 = carry
        dt_i, acc_1, gyr_1, on = inp
        un_acc_0 = rot.quat_rotate(q, acc_0 - ba) - gravity
        un_gyr = 0.5 * (gyr_0 + gyr_1) - bg
        q_new = rot.quat_normalize(rot.quat_mul(q, rot.delta_q(un_gyr * dt_i)))
        un_acc_1 = rot.quat_rotate(q_new, acc_1 - ba) - gravity
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        p_new = p + dt_i * v + 0.5 * dt_i * dt_i * un_acc
        v_new = v + dt_i * un_acc

        def sel(new, old):
            return jnp.where(on, new, old)

        return (sel(p_new, p), sel(q_new, q), sel(v_new, v),
                sel(acc_1, acc_0), sel(gyr_1, gyr_0)), None

    (p, q, v, last_acc, last_gyr), _ = jax.lax.scan(
        step, (p, q, v, prev_acc, prev_gyr), (dt, acc, gyr, active),
        unroll=8 if m <= 32 else 1,
    )
    return p, q, v, last_acc, last_gyr


def evaluate(
    pre: Preintegration,
    p_i: jax.Array, q_i: jax.Array, v_i: jax.Array, ba_i: jax.Array, bg_i: jax.Array,
    p_j: jax.Array, q_j: jax.Array, v_j: jax.Array, ba_j: jax.Array, bg_j: jax.Array,
    gravity: jax.Array,
) -> jax.Array:
    """15-d preintegration residual with first-order bias correction
    (IntegrationBase::evaluate, integration_base.h:162-191). Broadcasts over
    leading batch dims."""
    dp_dba = pre.jac[..., O_P:O_P+3, O_BA:O_BA+3]
    dp_dbg = pre.jac[..., O_P:O_P+3, O_BG:O_BG+3]
    dq_dbg = pre.jac[..., O_R:O_R+3, O_BG:O_BG+3]
    dv_dba = pre.jac[..., O_V:O_V+3, O_BA:O_BA+3]
    dv_dbg = pre.jac[..., O_V:O_V+3, O_BG:O_BG+3]

    dba = ba_i - pre.lin_ba
    dbg = bg_i - pre.lin_bg

    mv = lambda m, x: jnp.einsum("...ij,...j->...i", m, x)
    corrected_dq = rot.quat_mul(pre.dq, rot.delta_q(mv(dq_dbg, dbg)))
    corrected_dv = pre.dv + mv(dv_dba, dba) + mv(dv_dbg, dbg)
    corrected_dp = pre.dp + mv(dp_dba, dba) + mv(dp_dbg, dbg)

    sdt = pre.sum_dt[..., None]
    q_i_inv = rot.quat_conjugate(q_i)
    r_p = rot.quat_rotate(
        q_i_inv, 0.5 * gravity * sdt * sdt + p_j - p_i - v_i * sdt
    ) - corrected_dp
    r_q = 2.0 * rot.quat_mul(
        rot.quat_conjugate(corrected_dq), rot.quat_mul(q_i_inv, q_j)
    )[..., 1:4]
    r_v = rot.quat_rotate(q_i_inv, gravity * sdt + v_j - v_i) - corrected_dv
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg], axis=-1)
