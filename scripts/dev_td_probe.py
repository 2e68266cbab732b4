"""Probe td-estimation convergence dynamics.

Question from the round-4 build: td converges toward the injected offset but
slowly (~2.9 ms of 10 ms in 3 s). Hypothesis: the FEJ marginalization prior
anchors td at its current (wrong) estimate each frame, so convergence is
rate-limited by the prior-vs-window information ratio. This probe prints,
per solved frame: td, the prior's td information (J0^T J0 at TD_COL), and
the position error — optionally with the prior td column zeroed after each
step to isolate the anchoring effect.

Usage: python scripts/dev_td_probe.py [--zero-prior-td] [--iters N]
       [--duration S] [--td MS]
"""

import argparse
import dataclasses
import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.solver import layout

from test_backend_sim import frame_input, make_cfg  # noqa: E402

W = est.W


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zero-prior-td", action="store_true")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--duration", type=float, default=4.0)
    ap.add_argument("--td", type=float, default=10.0, help="injected offset, ms")
    ap.add_argument("--forget", type=float, default=None,
                    help="override td_prior_forget")
    ap.add_argument("--init", type=float, default=0.0,
                    help="td_init in ms (stability probe: start at truth)")
    ap.add_argument("--cost-scan", type=int, default=None,
                    help="at this frame, scan window cost over a td grid")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    td_true = args.td * 1e-3
    scfg = sim.SimConfig(duration=args.duration, num_landmarks=500,
                         max_features=120, cam_time_offset=td_true)
    cfg = make_cfg()
    est_kw = dict(estimate_td=True, td_init=args.init * 1e-3)
    if args.forget is not None:
        est_kw["td_prior_forget"] = args.forget
    cfg = dataclasses.replace(
        cfg, estimator=dataclasses.replace(cfg.estimator, **est_kw))
    dtype = jnp.float32
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    params = est.make_params(cfg, dtype)
    state = est.init_state(cfg, params, dtype)
    book = jax.jit(est.bookkeeping_step)
    solve = jax.jit(est.solve_and_slide, static_argnames=("num_iterations",))

    for fi in range(W):
        inp = frame_input(data, fi, dtype)
        state, _ = book(state, inp, params)
        fc = int(state.frame_count)
        w = state.window
        state = state._replace(window=w._replace(
            p=w.p.at[fc].set(jnp.asarray(data.gt_p[fi], dtype)),
            q=w.q.at[fc].set(jnp.asarray(data.gt_q[fi], dtype)),
            v=w.v.at[fc].set(jnp.asarray(data.gt_v[fi], dtype)),
        ))
        if fi < W - 1:
            state = state._replace(
                frame_count=jnp.asarray(fi + 1, jnp.int32),
                window=state.window._replace(
                    p=state.window.p.at[fi + 1].set(state.window.p[fi]),
                    q=state.window.q.at[fi + 1].set(state.window.q[fi]),
                    v=state.window.v.at[fi + 1].set(state.window.v[fi]),
                ))

    tdc = layout.TD_COL
    print(f"frame | td(ms) | prior_td_info | err(cm)   "
          f"[zero_prior_td={args.zero_prior_td}, iters={args.iters}]")
    for fi in range(W - 1, min(len(data.frames), 10**9)):
        if fi >= W:
            state, is_kf = book(state, frame_input(data, fi, dtype), params)
        else:
            is_kf = jnp.asarray(True)
        state, p_out, q_out, diag = solve(
            state, is_kf, params, num_iterations=args.iters)
        if args.zero_prior_td:
            J0 = state.prior.J0
            J0 = J0.at[:, tdc].set(0.0).at[tdc, :].set(0.0)
            state = state._replace(prior=state.prior._replace(J0=J0))
        info = float(jnp.sum(state.prior.J0[:, tdc] ** 2))
        err = float(np.linalg.norm(np.asarray(p_out) - data.gt_p[fi]))
        if fi % 5 == 0 or fi == len(data.frames) - 1:
            print(f"{fi:5d} | {float(state.td)*1e3:7.3f} | {info:11.3e} | "
                  f"{err*100:7.2f} | Iw={float(diag.td_info):.3e} "
                  f"gain={float(diag.td_gain):.3f}")
        if args.cost_scan is not None and fi == args.cost_scan:
            grid = np.linspace(-0.004, 0.016, 21)
            cs = cost_scan(state, params, grid)
            c0 = min(cs)
            for g, c in zip(grid, cs):
                bar = '#' * int(60 * (c - c0) / max(max(cs) - c0, 1e-9))
                print(f"   td={g*1e3:6.2f} ms  cost={c:14.4f} {bar}")
    print(f"final td = {float(state.td)*1e3:.3f} ms (true {args.td:.1f})")




def cost_scan(state, params, td_grid):
    """Scan total window cost over td with all other states at their solved
    values — localizes whether the window cost genuinely prefers a td."""
    from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov
    from mobile_slam_tpu.solver import assembly, lm as lm_mod
    from mobile_slam_tpu.solver.lm import eligible_mask

    w = state.window
    table = state.table
    elig = eligible_mask(table)
    safe_depth = jnp.where(table.depth > 0, table.depth, 5.0)
    lam0 = jnp.where(elig, 1.0 / safe_depth, 1.0)
    imu_sqrt_info = sqrt_info_from_cov(w.pre.cov[1:])
    imu_valid = (w.pre.sum_dt[1:] < 10.0) & (w.imu_cnt[1:] > 0)
    proj_valid = assembly.proj_valid_mask(table)
    sp = est.solver_params(params)

    def cost(td):
        x = assembly.XState(p=w.p, q=w.q, v=w.v, ba=w.ba, bg=w.bg,
                            lam=lam0, td=jnp.asarray(td, jnp.float32))
        return assembly.total_cost(x, table, w.pre, imu_sqrt_info, imu_valid,
                                   state.prior, params.ex_t, params.ex_q,
                                   sp, proj_valid)
    return [float(jax.jit(cost)(td)) for td in td_grid]


if __name__ == "__main__":
    main()
