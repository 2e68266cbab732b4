"""Per-stage timing breakdown of the image-path hot loop on the real chip.

The reference's profiling hooks time detectAndTrack vs processImage
(vio_engine.cpp:209-243); under XLA everything fuses into one program, so
the per-stage breakdown comes from timing each stage as its own jitted
program on representative data. Rates are throughput (K dispatches
back-to-back, block once), not RTT-bound single-call latency.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_stage_timing.py
  ... [--cpu] [--reps=30]
"""

import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.frontend import tracker as trk
from mobile_slam_tpu.models.cameras.base import make_camera
from mobile_slam_tpu.ops import clahe as clahe_op
from mobile_slam_tpu.ops import corners, image as im, lk, ransac

sys.path.insert(0, ".")
import bench  # noqa: E402  (repo-root bench config helpers)

REPS = int(next((a.split("=")[1] for a in sys.argv
                 if a.startswith("--reps=")), 30))


def timed(name, fn, *args, reps=REPS):
    """Median per-call seconds over back-to-back dispatch batches."""
    out = fn(*args)
    jax.block_until_ready(out)          # compile + warmup
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        trials.append((time.perf_counter() - t0) / reps)
    ms = 1e3 * min(trials)
    print(f"{name:34s} {ms:8.3f} ms   ({1.0/(ms*1e-3):8.1f} /s)")
    return ms


def main():
    cfg = bench.make_cfg()
    cam64 = make_camera(cfg.camera, dtype=jnp.float64)
    scfg = sim.SimConfig(
        duration=8.0, cam_rate=20.0, imu_rate=200.0, num_landmarks=900,
        max_features=150, acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
        seed=7,
    )
    data = sim.simulate(scfg, cam64, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    print(f"device={jax.devices()[0]}  image=512x512  "
          f"K={cfg.tracker.max_points}  reps={REPS}", file=sys.stderr)

    # Warm engine state: stream rendered frames until TRACKING so the
    # tracker state and estimator window are realistic.
    engine = VIOEngine(cfg, jnp.float32)
    imu_i = 0
    frames = []
    for fi, ts in enumerate(data.cam_ts):
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        frame = sim.render_frame(data, fi, cam64, cfg.camera.r_ic_mat,
                                 cfg.camera.t_ic_vec)
        frames.append(frame)
        res = engine.process_frame(frame, ts)
        if res.status == Status.TRACKING and fi >= 16:
            break

    dtype = jnp.float32
    img = jax.device_put(jnp.asarray(frames[-1], dtype))
    ts_dev = jnp.asarray(0.05, dtype)
    tstate = engine.tracker_state
    tcfg = cfg.tracker
    camera = engine.camera
    key = jax.random.PRNGKey(0)

    eq = jax.jit(lambda x: clahe_op.clahe(x, clip_limit=3.0, tiles=8))
    img_eq = eq(img)

    pyr_fn = jax.jit(
        lambda x: tuple(im.build_pyramid(x, tcfg.lk_pyramid_levels)))
    pyr = pyr_fn(img_eq)
    params = lk.LKParams(window=tcfg.lk_window_size,
                         levels=tcfg.lk_pyramid_levels,
                         iters=tcfg.lk_iterations, eps=tcfg.lk_eps)

    lk_fn = jax.jit(lambda p0, p1, pts, act: lk.track_pyramidal(
        list(p0), list(p1), pts, act, params))

    anchor_fn = jax.jit(lambda x, st, pts, act: lk.refine_template(
        x, st.anchor_tp, st.anchor_gx, st.anchor_gy, pts, act,
        tcfg.lk_window_size, tcfg.anchor_iters, tcfg.lk_eps,
        tcfg.anchor_max_shift))

    def _shi(x, pts, act):
        r = corners.min_eig_response(x)
        r = corners.occupancy_suppression(r, pts, act, tcfg.min_dist)
        return corners.detect_grid(r, tcfg.min_dist, tcfg.max_points,
                                   tcfg.quality_level)
    shi_fn = jax.jit(_shi)

    def _ransac(pts0, pts1, act, k):
        F, status = ransac.find_fundamental_ransac(
            pts0, pts1, act, jnp.asarray(tcfg.f_threshold, dtype), k,
            num_hypotheses=tcfg.ransac_iters)
        return ransac.edge_recovery(
            F, pts0, pts1, pts1, status, act,
            jnp.asarray(tcfg.f_threshold, dtype),
            jnp.asarray(tcfg.f_threshold_edge_factor, dtype),
            jnp.asarray(256.0, dtype), jnp.asarray(256.0, dtype))
    ransac_fn = jax.jit(_ransac)

    full_fn = jax.jit(lambda st, x, t, k: trk.detect_and_track(
        st, x, t, camera, tcfg, k, cfg.camera.focal_length))

    pts, act = tstate.pts, tstate.active

    from mobile_slam_tpu.ops import lk_pallas

    lkp_fn = jax.jit(lambda p0, p1, p, m: lk_pallas.track_pyramidal(
        p0, p1, p, m, params))
    anchorp_fn = jax.jit(lambda x, st, p, m: lk_pallas.refine_template(
        x, st.anchor_tp, st.anchor_gx, st.anchor_gy, p, m,
        tcfg.lk_window_size, tcfg.anchor_iters, tcfg.lk_eps,
        tcfg.anchor_max_shift))

    print("\n--- frontend stages (one 512x512 frame) ---")
    t_clahe = timed("clahe", eq, img)
    t_pyr = timed("build_pyramid(3)", pyr_fn, img_eq)
    t_lk = timed("LK fwd (pallas)", lkp_fn, tuple(tstate.pyr), pyr,
                 pts, act)
    t_fb = timed("LK bwd (pallas)", lkp_fn, pyr, tuple(tstate.pyr),
                 pts, act)
    t_anchor = timed("anchor refine (pallas)", anchorp_fn, img_eq, tstate,
                     pts, act)
    t_shi = timed("Shi-Tomasi (resp+suppr+grid)", shi_fn, img_eq, pts, act)
    t_ransac = timed("F-RANSAC + edge_recovery", ransac_fn, pts,
                     pts + 1.0, act, key)
    t_full = timed("detect_and_track (full)", full_fn, tstate, img, ts_dev,
                   key)
    if "--xla-lk" in sys.argv:
        timed("LK fwd (xla gathers)", lk_fn, tuple(tstate.pyr), pyr,
              pts, act)
        timed("anchor refine (xla)", anchor_fn, img_eq, tstate, pts, act)

    # Sub-part probes for the remaining image-wide stages.
    print("\n--- sub-parts ---")
    timed("sobel+box (structure tensor)", jax.jit(corners.min_eig_response),
          img_eq)
    timed("occupancy reduce_window 41x41",
          jax.jit(lambda r, p, m: corners.occupancy_suppression(
              r, p, m, tcfg.min_dist)), img_eq, pts, act)
    resp = jax.jit(corners.min_eig_response)(img_eq)
    timed("NMS reduce_window + top_k",
          jax.jit(lambda r: corners.detect_grid(
              r, tcfg.min_dist, tcfg.max_points, tcfg.quality_level)), resp)
    timed("top_k alone",
          jax.jit(lambda r: jax.lax.top_k(r.reshape(-1),
                                          tcfg.max_points)), resp)
    xi = jnp.round(jnp.clip(img, 0, 255)).astype(jnp.int32)
    timed("clahe hist (one-hot sum)",
          jax.jit(lambda v: jnp.sum(jax.nn.one_hot(
              v.reshape(64, 64 * 64), 256, dtype=jnp.float32), axis=1)), xi)
    lut_d = jnp.zeros((8, 8, 256), jnp.float32)
    y0 = jnp.clip(jnp.arange(512) // 64, 0, 7)
    timed("clahe LUT 4x gather",
          jax.jit(lambda l, v: l[y0[:, None], y0[None, :], v]), lut_d, xi)

    print("\n--- estimator (one frame, window=11) ---")
    is_kf = jnp.asarray(True)
    t_solve = timed(f"solve_and_slide ({cfg.estimator.num_iterations} LM iters)", engine._solve,
                    engine.state, is_kf, engine.params)

    # Solver sub-parts at the same state/shapes.
    from mobile_slam_tpu.engine import estimator as est_mod
    from mobile_slam_tpu.factors import marginalization
    from mobile_slam_tpu.factors.imu_factor import sqrt_info_from_cov
    from mobile_slam_tpu.frontend import feature_table as ft
    from mobile_slam_tpu.models.state import eligible_mask
    from mobile_slam_tpu.solver import assembly, lm as lm_mod

    st = engine.state
    pp = engine.params
    sp = est_mod.solver_params(pp)
    wdw = st.window
    tri = jax.jit(ft.triangulate)
    table = tri(st.table, wdw.p, wdw.q, pp.ex_t, pp.ex_q, pp.init_depth)
    timed("  triangulate", tri, st.table, wdw.p, wdw.q, pp.ex_t, pp.ex_q,
          pp.init_depth)

    elig = eligible_mask(table)
    safe_depth = jnp.where(table.depth > 0, table.depth, pp.init_depth)
    lam0 = jnp.where(elig, 1.0 / safe_depth, 1.0)
    x0 = assembly.XState(p=wdw.p, q=wdw.q, v=wdw.v, ba=wdw.ba, bg=wdw.bg,
                         lam=lam0, td=jnp.zeros((), wdw.p.dtype))
    imu_sqrt_info = jax.jit(sqrt_info_from_cov)(wdw.pre.cov[1:])
    imu_valid = (wdw.pre.sum_dt[1:] < 10.0) & (wdw.imu_cnt[1:] > 0)
    proj_valid = jax.jit(assembly.proj_valid_mask)(table)
    prior_H0 = st.prior.J0.T @ st.prior.J0

    eqs_fn = jax.jit(lambda x: assembly.build_normal_eqs(
        x, table, wdw.pre, imu_sqrt_info, imu_valid, st.prior, prior_H0,
        pp.ex_t, pp.ex_q, sp, proj_valid))
    eqs = eqs_fn(x0)
    timed("  build_normal_eqs (x1)", eqs_fn, x0)
    sd_fn = jax.jit(lambda e: lm_mod._solve_damped(
        e, jnp.asarray(1e-8, dtype), elig, dtype))
    timed("  _solve_damped (x1)", sd_fn, eqs)
    cost_fn = jax.jit(lambda x: assembly.total_cost(
        x, table, wdw.pre, imu_sqrt_info, imu_valid, st.prior,
        pp.ex_t, pp.ex_q, sp, proj_valid))
    timed("  total_cost (x1)", cost_fn, x0)
    n_it = cfg.estimator.num_iterations
    lm_fn = jax.jit(lambda x: lm_mod.solve(
        x, table, wdw, st.prior, pp.ex_t, pp.ex_q, sp, n_it))
    timed(f"  lm.solve ({n_it} iters)", lm_fn, x0)
    mo_fn = jax.jit(lambda x: marginalization.marginalize_old(
        x, table, wdw, imu_sqrt_info, st.prior, pp.ex_t, pp.ex_q, sp))
    timed("  marginalize_old", mo_fn, x0)
    mn_fn = jax.jit(lambda x: marginalization.marginalize_new(
        x, st.prior, pp.ex_t, pp.ex_q))
    timed("  marginalize_new", mn_fn, x0)

    print("\n--- summary ---")
    known = (t_clahe + t_pyr + t_lk + t_fb + t_anchor + t_shi + t_ransac)
    print(f"frontend stage sum {known:8.3f} ms vs fused full "
          f"{t_full:8.3f} ms (fusion gain {known - t_full:+.3f} ms)")
    total = t_full + t_solve
    print(f"per-frame total (tracker + solve): {total:.3f} ms "
          f"-> {1e3/total:.1f} fps ceiling")


if __name__ == "__main__":
    main()
