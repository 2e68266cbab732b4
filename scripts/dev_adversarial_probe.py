"""Per-frame diagnostic trace of the adversarial image path.

Round-4 root-cause tool for the level-1 tracking loss (VERDICT r3 missing
item 2: 49/241 poses at nuisance level 1). Runs the exact bench
--adversarial arm but through an INSTRUMENTED chunked step that emits the
full StepDiag per frame (med_depth, vel/pos norms, finiteness, solver
costs, track counts, runaway-gate state), so we can see WHICH guard kills
`ok` and whether the estimator diverges or the gate false-trips.

Usage:
    python scripts/dev_adversarial_probe.py --level=1 --seed=11 \
        --duration=12 [--render-cache=/tmp/adv_cache]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mobile_slam_tpu.engine import chunked, estimator as est
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import adversarial as adv
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.eval.evaluator import compute_ate
from mobile_slam_tpu.frontend import tracker as trk


def arg(name, default):
    return next((a.split("=")[1] for a in sys.argv
                 if a.startswith(f"--{name}=")), default)


LEVEL = int(arg("level", "1"))
SEED = int(arg("seed", "11"))
DURATION = float(arg("duration", "12"))
CACHE_DIR = arg("render-cache", "/tmp/adv_cache")
CHUNK = 50


def render_arm(cfg, nuis, scfg):
    os.makedirs(CACHE_DIR, exist_ok=True)
    key = f"l{LEVEL}_s{SEED}_d{int(DURATION)}"
    cache = os.path.join(CACHE_DIR, f"frames_{key}.npz")
    data = adv.make_adversarial_data(
        scfg, cfg.camera, bench.R_IC, np.asarray(cfg.camera.t_ic_vec), nuis)
    if os.path.exists(cache):
        frames = list(np.load(cache)["frames"])
        print(f"[probe] loaded {len(frames)} cached frames ({cache})",
              file=sys.stderr)
    else:
        movers = adv.make_movers(nuis)
        t_r = time.perf_counter()
        frames = [adv.render_frame_adversarial(
            data, fi, cfg.camera, bench.R_IC,
            np.asarray(cfg.camera.t_ic_vec), nuis, movers)
            for fi in range(len(data.cam_ts))]
        print(f"[probe] rendered {len(frames)} frames in "
              f"{time.perf_counter()-t_r:.0f}s", file=sys.stderr)
        np.savez_compressed(cache, frames=np.stack(frames))
    return data, frames


def make_probe_step(params, num_iterations, tracker_cfg, camera, focal):
    """make_image_frame_step with the FULL StepDiag surfaced per frame."""

    def one_frame(carry: chunked.ImageChunkCarry, scan_x):
        inp, pre = scan_x
        key, sub = jax.random.split(carry.key)
        tstate, tout = trk.detect_and_track(
            carry.tracker_state, inp.img, inp.ts, camera, tracker_cfg,
            sub, focal, banned_ids=carry.banned_ids, preprocessed=pre,
        )
        finp = est.FrameInput(
            ts=inp.ts, ids=tout.ids, obs=tout.obs, uv=tout.uv,
            vel=tout.vel, valid=tout.valid,
            imu_dt=inp.imu_dt, imu_acc=inp.imu_acc, imu_gyr=inp.imu_gyr,
            imu_cnt=inp.imu_cnt,
        )
        state, is_kf = est.bookkeeping_step(carry.est_state, finp, params)
        state, p, q, diag = est.solve_and_slide(
            state, is_kf, params, num_iterations)
        ema1, vema1, runaway = chunked.scale_gate(
            carry.depth_ema, carry.vel_ema, diag.med_depth, diag.vel_norm)
        ok = (diag.state_finite & (diag.vel_norm <= 10.0)
              & (diag.pos_norm <= 100.0) & ~runaway)
        n_tracked = jnp.sum(tout.valid)
        out = (p, q, ok, diag.is_keyframe, diag.med_depth, diag.vel_norm,
               diag.pos_norm, diag.state_finite, runaway,
               diag.last_track_num, diag.solver_cost0, diag.solver_cost,
               diag.accepted_steps, carry.depth_ema, carry.vel_ema,
               n_tracked)
        return (chunked.ImageChunkCarry(state, tstate, diag.culled_ids, key,
                                        ema1, vema1), out)

    def chunk(carry, inputs):
        pre = jax.vmap(lambda im_: trk.preprocess_frame(im_, tracker_cfg))(
            inputs.img)
        return jax.lax.scan(one_frame, carry, (inputs, pre))

    return jax.jit(chunk, donate_argnums=(0,))


def main():
    cfg = bench.make_cfg()
    nuis = adv.LEVELS[LEVEL]
    scfg = sim.SimConfig(
        duration=DURATION, cam_rate=20.0, imu_rate=200.0,
        num_landmarks=900, max_features=150,
        acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.0,
        acc_bias=(0.01, -0.005, 0.015),
        gyr_bias=(0.001, -0.0005, 0.0008), seed=SEED,
    )
    data, frames = render_arm(cfg, nuis, scfg)
    n_img = len(frames)

    engine = VIOEngine(cfg, jnp.float32)
    imu_i = 0
    init_frame = None
    fi = 0
    while fi < n_img:
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        res = engine.process_frame(frames[fi], ts)
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
            print(f"[probe] initialized at frame {init_frame}",
                  file=sys.stderr)
        if init_frame is not None and fi >= init_frame + 3:
            break
    if init_frame is None:
        print("[probe] never initialized", file=sys.stderr)
        return

    step = make_probe_step(engine.params, cfg.estimator.num_iterations,
                           cfg.tracker, engine.camera,
                           cfg.camera.focal_length)
    carry = chunked.ImageChunkCarry(
        est_state=engine.state, tracker_state=engine.tracker_state,
        banned_ids=engine._banned_ids, key=engine._key,
        depth_ema=jnp.asarray(engine._depth_ema or 0.0, jnp.float32),
        vel_ema=jnp.asarray(engine._vel_ema, jnp.float32),
    )
    t0_seq = engine._t0
    dtype = jnp.float32
    rows = []
    frame_ids = []
    while fi + CHUNK <= n_img:
        inputs = []
        for k in range(CHUNK):
            j = fi + k
            t1 = data.cam_ts[j]
            tp = data.cam_ts[j - 1]
            dt, acc, gyr = sim.imu_between(data, tp, t1)
            m_pad = cfg.estimator.max_imu_per_interval
            m = min(len(dt), m_pad)

            def pad(a, n_p, sh):
                out = np.zeros((n_p,) + sh)
                out[:len(a)] = a[:n_p]
                return out

            inputs.append(chunked.ImageFrameInput(
                img=jnp.asarray(frames[j], dtype),
                ts=jnp.asarray(t1 - t0_seq, dtype),
                imu_dt=jnp.asarray(pad(dt, m_pad, ()), dtype),
                imu_acc=jnp.asarray(pad(acc, m_pad, (3,)), dtype),
                imu_gyr=jnp.asarray(pad(gyr, m_pad, (3,)), dtype),
                imu_cnt=jnp.asarray(m, jnp.int32),
            ))
        batch = jax.device_put(chunked.stack_image_inputs(inputs))
        carry, out = step(carry, batch)
        out = [np.asarray(o) for o in out]
        for k in range(CHUNK):
            rows.append([o[k] for o in out])
            frame_ids.append(fi + k)
        fi += CHUNK

    names = ("p", "q", "ok", "kf", "med_depth", "vel", "pos", "finite",
             "runaway", "trknum", "cost0", "cost", "accept", "dema",
             "vema", "n_trk")
    est_ts, est_p = [], []
    print(f"{'fr':>4} {'ok':>3} {'kf':>3} {'medD':>7} {'vel':>6} {'pos':>6} "
          f"{'fin':>4} {'run':>4} {'trk#':>5} {'nTrk':>5} {'cost0':>10} "
          f"{'cost':>10} {'acc':>4} {'dEMA':>7} {'vEMA':>6}")
    first_bad = None
    for j, r in zip(frame_ids, rows):
        d = dict(zip(names, r))
        if d["ok"]:
            est_ts.append(data.cam_ts[j])
            est_p.append(np.asarray(d["p"], np.float64))
        elif first_bad is None:
            first_bad = j
        # print every frame near the failure, every 5th elsewhere
        near = first_bad is not None and abs(j - first_bad) <= 25
        if near or j % 5 == 0 or not d["ok"]:
            print(f"{j:>4} {int(d['ok']):>3} {int(d['kf']):>3} "
                  f"{float(d['med_depth']):>7.2f} {float(d['vel']):>6.2f} "
                  f"{float(d['pos']):>6.1f} {int(d['finite']):>4} "
                  f"{int(d['runaway']):>4} {int(d['trknum']):>5} "
                  f"{int(d['n_trk']):>5} {float(d['cost0']):>10.1f} "
                  f"{float(d['cost']):>10.1f} {int(d['accept']):>4} "
                  f"{float(d['dema']):>7.2f} {float(d['vema']):>6.2f}")
    if len(est_p) > 10:
        ate = compute_ate(np.asarray(est_ts), np.asarray(est_p),
                          data.cam_ts, data.gt_p, with_scale=True).rmse
        print(f"[probe] level {LEVEL} seed {SEED}: ATE {ate:.4f} m, "
              f"{len(est_p)}/{n_img} poses", file=sys.stderr)
    else:
        print(f"[probe] level {LEVEL} seed {SEED}: only {len(est_p)} poses",
              file=sys.stderr)


if __name__ == "__main__":
    main()
