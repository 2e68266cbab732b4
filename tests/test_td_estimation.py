"""Online camera-IMU time-offset (td) estimation.

The reference explicitly LACKS td estimation (its own analysis lists it as
a missing feature, docs/analysis-report.md:408-418) — this capability goes
beyond parity. The model is VINS-Fusion's ProjectionTdFactor idea: the
feature reported at image time t was really sampled at t + td, so the
observation is corrected as ray - td * vel before projection
(factors/projection.py), with td one jointly-solved tangent dimension
(solver/layout.py TD_COL) that participates in FEJ marginalization.

These tests inject a known sampling offset into the synthetic sequence
(eval/simulation.py SimConfig.cam_time_offset) and check that

* with estimate_td ON the solver recovers td to sub-frame accuracy and the
  trajectory error stays near the offset-free baseline;
* with estimate_td OFF the same sequence shows materially worse drift
  (the A/B that motivates the feature);
* with no offset and estimation ON, td stays near zero (no spurious
  drift — the gate/clamp sanity direction).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import EstimatorConfig
from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera

from tests.test_backend_sim import frame_input, make_cfg

W = est.W
TD_TRUE = 0.010  # 2 IMU steps at 200 Hz; half a typical mobile exposure lag


def _cfg(estimate_td: bool):
    cfg = make_cfg()
    # Production solver budget (2 LM iterations — the round-3 default,
    # config.EstimatorConfig.num_iterations notes). The legacy 8-iteration
    # harness budget DIVERGES on td-offset data with or without estimation
    # (measured: 74 cm mean drift both arms at 8 iters vs <=8 cm at 2 —
    # deeper solves absorb the model mismatch into velocity/bias states
    # harder each frame; scripts/dev_td_probe.py --iters 8).
    return dataclasses.replace(
        cfg,
        estimator=dataclasses.replace(
            cfg.estimator, estimate_td=estimate_td, num_iterations=2,
        ),
    )


def _run(scfg, estimate_td: bool, n_frames: int, dtype=jnp.float32):
    cfg = _cfg(estimate_td)
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    params = est.make_params(cfg, dtype)
    state = est.init_state(cfg, params, dtype)
    book = jax.jit(est.bookkeeping_step)
    solve = jax.jit(est.solve_and_slide, static_argnames=("num_iterations",))

    # Ground-truth bootstrap (as in test_backend_sim.run_tracking): the test
    # isolates the solver from the SfM initializer.
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
                ),
            )

    errs, tds = [], []
    n_end = min(n_frames, len(data.frames))
    for fi in range(W - 1, n_end):
        if fi >= W:
            state, is_kf = book(state, frame_input(data, fi, dtype), params)
        else:
            is_kf = jnp.asarray(True)
        state, p_out, q_out, diag = solve(
            state, is_kf, params, num_iterations=cfg.estimator.num_iterations
        )
        assert bool(diag.state_finite), f"NaN state at frame {fi}"
        errs.append(np.linalg.norm(np.asarray(p_out) - data.gt_p[fi]))
        tds.append(float(state.td))
    return np.asarray(errs), np.asarray(tds)


class TestTdEstimation:
    def test_recovers_injected_offset(self):
        scfg = sim.SimConfig(duration=3.0, num_landmarks=500,
                             max_features=120, cam_time_offset=TD_TRUE)
        errs, tds = _run(scfg, estimate_td=True, n_frames=60)
        # Converged estimate: mean of the last third within 40% of truth
        # (sub-frame: one frame is 50 ms, we ask for ±4 ms).
        td_final = tds[-len(tds) // 3:].mean()
        assert abs(td_final - TD_TRUE) < 0.004, (
            f"td estimate {td_final*1e3:.2f} ms vs true {TD_TRUE*1e3:.1f} ms"
        )
        # Trajectory healthy with the offset absorbed (vs ~74 cm at the
        # same offset with the 8-iteration harness budget).
        assert errs.mean() < 0.06, f"mean drift {errs.mean()*100:.2f} cm"

    def test_ab_beats_no_estimation(self):
        scfg = sim.SimConfig(duration=3.0, num_landmarks=500,
                             max_features=120, cam_time_offset=TD_TRUE)
        errs_on, _ = _run(scfg, estimate_td=True, n_frames=60)
        errs_off, tds_off = _run(scfg, estimate_td=False, n_frames=60)
        # Gate respected: td frozen at td_init when disabled.
        assert np.all(tds_off == 0.0)
        assert errs_on.mean() < 0.7 * errs_off.mean(), (
            f"td-on {errs_on.mean()*100:.2f} cm not better than "
            f"td-off {errs_off.mean()*100:.2f} cm"
        )

    def test_no_offset_stays_near_zero(self):
        scfg = sim.SimConfig(duration=3.0, num_landmarks=500,
                             max_features=120, cam_time_offset=0.0)
        errs, tds = _run(scfg, estimate_td=True, n_frames=60)
        assert abs(tds[-len(tds) // 3:].mean()) < 0.003
        assert errs.mean() < 0.05

    def test_clamp_and_config_plumbing(self):
        e = EstimatorConfig(estimate_td=True, td_init=0.5)
        # td_init beyond td_max is representable in config; the solver clamp
        # (lm.optimize) bounds the SOLVED value each step.
        assert e.td_max == 0.08
        cfg = _cfg(True)
        params = est.make_params(cfg, jnp.float32)
        assert float(params.td_enable) == 1.0
        sp = est.solver_params(params)
        assert abs(float(sp.td_max) - 0.08) < 1e-6
