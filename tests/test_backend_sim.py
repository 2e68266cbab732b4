"""End-to-end backend test on the synthetic visual-inertial simulation:
solver + FEJ marginalization + window slides tracking a known trajectory.
(The backend analog of the reference's tests/test_vio_engine_parity.cpp —
ground truth here is exact instead of another pipeline.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera

K_PAD = 144
M_PAD = 16

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])


def make_cfg():
    cam = CameraConfig(
        model_type="PINHOLE", width=640, height=480,
        focal_length=460.0, fx=460.0, fy=460.0, cx=320.0, cy=240.0,
        r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.05, 0.02, -0.03),
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=120, max_points=K_PAD),
        estimator=EstimatorConfig(
            max_features=256, max_imu_per_interval=M_PAD, num_iterations=8,
            acc_n=0.05, gyr_n=0.004, acc_w=4e-5, gyr_w=2e-6,
        ),
    )


def frame_input(simdata, fi, dtype):
    f = simdata.frames[fi]
    t1 = simdata.cam_ts[fi]
    t0 = simdata.cam_ts[fi - 1] if fi > 0 else t1 - 0.05
    dt, acc, gyr = sim.imu_between(simdata, t0, t1)
    k, m = len(f["ids"]), len(dt)

    def pad(a, n, sh):
        out = np.zeros((n,) + sh, dtype=np.float64)
        out[: len(a)] = a
        return out

    return est.FrameInput(
        ts=jnp.asarray(t1, dtype),
        ids=jnp.asarray(pad(f["ids"], K_PAD, ()), jnp.int32),
        obs=jnp.asarray(pad(f["rays"], K_PAD, (3,)), dtype),
        uv=jnp.asarray(pad(f["uv"], K_PAD, (2,)), dtype),
        vel=jnp.asarray(pad(f["vel"], K_PAD, (2,)), dtype),
        valid=jnp.asarray(np.arange(K_PAD) < k),
        imu_dt=jnp.asarray(pad(dt, M_PAD, ()), dtype),
        imu_acc=jnp.asarray(pad(acc, M_PAD, (3,)), dtype),
        imu_gyr=jnp.asarray(pad(gyr, M_PAD, (3,)), dtype),
        imu_cnt=jnp.asarray(m, jnp.int32),
    )


def run_tracking(scfg, dtype, n_frames):
    cfg = make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    params = est.make_params(cfg, dtype)
    state = est.init_state(cfg, params, dtype)
    book = jax.jit(est.bookkeeping_step)
    solve = jax.jit(est.solve_and_slide, static_argnames=("num_iterations",))

    W = est.W
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

    errs = []
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
    return np.asarray(errs)


class TestBackendTracking:
    def test_noiseless_f64_near_exact(self):
        scfg = sim.SimConfig(duration=3.0, num_landmarks=500, max_features=120)
        errs = run_tracking(scfg, jnp.float64, 60)
        # Sub-centimeter on noiseless data (the dogleg-style near-GN steps
        # trade ~5mm of noiseless purity for bias-valley traversal).
        assert errs.mean() < 0.01, f"mean drift {errs.mean()*100:.2f}cm"
        assert errs.max() < 0.02

    def test_noisy_f32_tracks(self):
        scfg = sim.SimConfig(
            duration=3.0, num_landmarks=500, max_features=120,
            acc_noise=0.05, gyr_noise=0.004, pixel_noise=0.5,
            acc_bias=(0.02, -0.01, 0.03), gyr_bias=(0.002, -0.001, 0.0015),
        )
        errs = run_tracking(scfg, jnp.float32, 60)
        assert errs.mean() < 0.06, f"mean drift {errs.mean()*100:.2f}cm"
        assert errs.max() < 0.15, f"max drift {errs.max()*100:.2f}cm"
