"""Dev smoke: drive the backend (no images) on the synthetic sim.

Constructs an initialized estimator at ground truth, then runs tracking
steps and prints per-frame position error. Not a test — a fast debugging
harness.
"""

import os
import sys
import time

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU via config unless the
# caller asks for the real device.
if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import estimator as est
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.utils import rotations as rot

DTYPE = jnp.float64 if "--f64" in sys.argv else jnp.float32
if DTYPE == jnp.float64 or "--marg64" in sys.argv or "--lm64" in sys.argv:
    jax.config.update("jax_enable_x64", True)

if "--marg64" in sys.argv:
    # Bisect: run ONLY the marginalization prior update in f64.
    from mobile_slam_tpu.factors import marginalization as _marg

    def _wrap(fn):
        def wrapped(*args):
            a64 = jax.tree.map(
                lambda x: x.astype(jnp.float64)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, args)
            out = fn(*a64)
            return jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, out)
        return wrapped

    _marg.marginalize_old = _wrap(_marg.marginalize_old)
    _marg.marginalize_new = _wrap(_marg.marginalize_new)

if "--lm64" in sys.argv:
    # Bisect: run ONLY the damped linear solve in f64.
    from mobile_slam_tpu.solver import lm as _lm
    _orig = _lm._solve_damped

    def _solve64(eqs, mu, lam_mask, dtype):
        eqs64 = jax.tree.map(
            lambda x: x.astype(jnp.float64)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, eqs)
        dx, dlam = _orig(eqs64, mu.astype(jnp.float64), lam_mask, jnp.float64)
        return dx.astype(jnp.float32), dlam.astype(jnp.float32)

    _lm._solve_damped = _solve64

K_PAD = 144
M_PAD = 16


def make_cfg():
    # Forward-looking camera: cam z (optical axis) = body +x, cam x = -body y,
    # cam y = -body z (body: x forward, y left, z up).
    r_ic = np.array([[0.0, 0.0, 1.0],
                     [-1.0, 0.0, 0.0],
                     [0.0, -1.0, 0.0]])
    cam = CameraConfig(
        model_type="PINHOLE", width=640, height=480,
        focal_length=460.0, fx=460.0, fy=460.0, cx=320.0, cy=240.0,
        r_ic=tuple(r_ic.reshape(-1)), t_ic=(0.05, 0.02, -0.03),
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
    k = len(f["ids"])
    m = len(dt)
    assert k <= K_PAD and m <= M_PAD, (k, m)
    pad = lambda a, n, sh: np.concatenate(
        [a, np.zeros((n - len(a),) + sh)], axis=0
    ) if len(a) < n else a
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


def main():
    cfg = make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    r_ic = cfg.camera.r_ic_mat
    t_ic = cfg.camera.t_ic_vec
    if "--noise" in sys.argv:
        scfg = sim.SimConfig(
            duration=6.0, num_landmarks=500, max_features=120,
            imu_rate=200.0, cam_rate=20.0,
            acc_noise=0.05, gyr_noise=0.004, pixel_noise=0.5,
            acc_bias=(0.02, -0.01, 0.03), gyr_bias=(0.002, -0.001, 0.0015),
        )
    else:
        scfg = sim.SimConfig(duration=6.0, num_landmarks=500, max_features=120,
                             imu_rate=200.0, cam_rate=20.0)
    data = sim.simulate(scfg, cam, r_ic, t_ic)
    print(f"sim: {len(data.frames)} frames, "
          f"feat/frame ~{np.mean([len(f['ids']) for f in data.frames]):.0f}")

    params = est.make_params(cfg, DTYPE)
    state = est.init_state(cfg, params, DTYPE)

    book = jax.jit(est.bookkeeping_step)
    solve = jax.jit(est.solve_and_slide, static_argnames=("num_iterations",))

    # Phase 1: fill window with GT states (bypassing host init).
    W = est.W
    for fi in range(W):
        inp = frame_input(data, fi, DTYPE)
        state, is_kf = book(state, inp, params)
        fc = int(state.frame_count)
        w = state.window
        state = state._replace(window=w._replace(
            p=w.p.at[fc].set(jnp.asarray(data.gt_p[fi], DTYPE)),
            q=w.q.at[fc].set(jnp.asarray(data.gt_q[fi], DTYPE)),
            v=w.v.at[fc].set(jnp.asarray(data.gt_v[fi], DTYPE)),
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

    # Phase 2: tracking. First solve covers the already-booked frame W-1
    # (the reference's first solveOdometry right after init), then each new
    # frame is booked + solved.
    print("compiling solve_and_slide...")
    t0 = time.time()
    errs = []
    for fi in range(W - 1, len(data.frames)):
        if fi >= W:
            inp = frame_input(data, fi, DTYPE)
            state, is_kf = book(state, inp, params)
        else:
            is_kf = jnp.asarray(True)
        state, p_out, q_out, diag = solve(
            state, is_kf, params, num_iterations=cfg.estimator.num_iterations
        )
        if fi == W:
            print(f"first solve wall: {time.time()-t0:.1f}s")
        err = np.linalg.norm(np.asarray(p_out) - data.gt_p[fi])
        ang = np.linalg.norm(np.asarray(
            rot.quat_boxminus(q_out, jnp.asarray(data.gt_q[fi], DTYPE))
        ))
        errs.append(err)
        if fi % 10 == 0 or fi < W + 5:
            print(f"f{fi:3d} kf={int(diag.is_keyframe)} "
                  f"err={err*100:7.2f}cm ang={np.degrees(ang):6.3f}deg "
                  f"cost {float(diag.solver_cost0):.3e}->{float(diag.solver_cost):.3e} "
                  f"acc={int(diag.accepted_steps)} vel={float(diag.vel_norm):.2f}")
    errs = np.asarray(errs)
    print(f"\nmean err {errs.mean()*100:.2f}cm  max {errs.max()*100:.2f}cm  "
          f"last {errs[-1]*100:.2f}cm")
    print(f"total wall {time.time()-t0:.1f}s for {len(errs)} frames")


if __name__ == "__main__":
    main()
