"""Landmark-sharded (tensor-parallel) bundle-adjustment solve step.

Intra-op model parallelism for the sliding-window solver: the projection
factors, the landmark (Schur) elimination, and the per-landmark
back-substitution are all independent sums over the landmark axis F, so
they shard cleanly across a device mesh — each device assembles the
normal-equation contributions of its F/n landmarks, the small dense
(171-dim) camera-state system is reduced with `psum` and solved
replicated, and the landmark updates stay local. This is the TPU-native
equivalent of the reference's pthread x4 Hessian assembly fan-out
(src/backend/factor/marginalization_factor.cpp:163-201) scaled past one
host: the only collectives are two psums of (165,165)/(165,) and one
all_gather of the (F,) landmark diagonal, all riding ICI.

Complements the pure-DP fleet mode (parallel/batch.py): DP scales
*sequences*, this scales a SINGLE sequence's solver — the relevant axis
once landmark capacity grows past the reference's 1000 slots.

Validated against the unsharded solver step in
tests/test_parallel.py (8-device CPU mesh, dx/dlam parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mobile_slam_tpu.solver import assembly, layout

NSOLVE = layout.EX_COL  # 165 solved dims (extrinsic held constant)


def tp_damped_step(
    x: assembly.XState,          # lam is (F,) — sharded on `axis`
    table,                        # FeatureTable, every leaf leading-F
    pre,                          # window preintegration (replicated)
    imu_sqrt_info: jax.Array,
    imu_valid: jax.Array,
    prior,
    prior_H0: jax.Array,
    ex_t: jax.Array, ex_q: jax.Array,
    sp,                           # SolverParams
    proj_valid: jax.Array,        # (F, W)
    lam_mask: jax.Array,          # (F,)
    mu: jax.Array,                # () damping
    mesh: Mesh,
    axis: str = "lm",
):
    """One damped Schur-complement solve with the landmark axis sharded
    over `mesh[axis]`. Returns (dx (165,) replicated, dlam (F,) sharded,
    cost () replicated). Mirrors solver/lm._solve_damped numerically
    (same damping floors and equilibration)."""
    def body(table_l, proj_valid_l, lam_mask_l, lam_l,
             x_r, pre_r, sqrt_r, valid_r, prior_r, prior_H0_r,
             ex_t_r, ex_q_r, sp_r, mu_r):
        # Leader shard contributes the replicated small factors exactly
        # once; every shard contributes its local projection factors.
        lead = jax.lax.axis_index(axis) == 0
        mu = mu_r
        x_l = x_r._replace(lam=lam_l)
        eqs = assembly.build_normal_eqs(
            x_l, table_l, pre_r, sqrt_r, valid_r & lead, prior_r,
            prior_H0_r, ex_t_r, ex_q_r, sp_r, proj_valid_l, use_prior=lead,
        )
        H_ss = jax.lax.psum(eqs.H_ss, axis)
        g_s = jax.lax.psum(eqs.g_s, axis)
        cost = jax.lax.psum(eqs.cost, axis)

        H = H_ss[:NSOLVE, :NSOLVE]
        g = g_s[:NSOLVE]
        H_sl = eqs.H_sl[:NSOLVE]             # (165, F_local) — stays local

        diag = jnp.diagonal(H)
        med = jnp.median(diag)
        floor = 1e-7 * med + 1e-10
        H_d = H + jnp.diag(mu * diag + floor)

        # The landmark-diagonal damping floor uses the GLOBAL median of
        # H_ll; (F,) scalars are cheap to all_gather.
        hll_all = jax.lax.all_gather(eqs.H_ll, axis).reshape(-1)
        hll_med = jnp.median(hll_all)
        hll = eqs.H_ll * (1.0 + mu) + 1e-6 * hll_med + 1e-12
        hll = jnp.where(lam_mask_l, hll, 1.0)
        inv_hll = 1.0 / hll

        w = (inv_hll * lam_mask_l)[None, :]
        H_red = H_d - jax.lax.psum((H_sl * w) @ H_sl.T, axis)
        g_red = g - jax.lax.psum(H_sl @ (inv_hll * eqs.g_l * lam_mask_l),
                                 axis)

        d = jnp.sqrt(jnp.clip(jnp.diagonal(H_red), 1e-12, None))
        Hn = H_red / (d[:, None] * d[None, :])
        L = jnp.linalg.cholesky(Hn)
        dxn = -jax.scipy.linalg.cho_solve((L, True), g_red / d)
        dx = dxn / d                          # replicated (same on all)
        dlam_l = -(eqs.g_l + H_sl.T @ dx) * inv_hll
        return dx, dlam_l, cost

    shard_f = P(axis)
    rep = P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(shard_f, shard_f, shard_f, shard_f,
                  rep, rep, rep, rep, rep, rep, rep, rep, rep, rep),
        out_specs=(P(), shard_f, P()),
        check_vma=False,
    )
    return fn(table, proj_valid, lam_mask, x.lam,
              x, pre, imu_sqrt_info, imu_valid, prior, prior_H0,
              ex_t, ex_q, sp, mu)


def shard_landmarks(tree, mesh: Mesh, axis: str = "lm"):
    """Place a leading-F pytree (FeatureTable, lam, masks) sharded over
    the mesh's landmark axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
