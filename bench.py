"""Benchmark: VIO throughput + accuracy on a TUM-VI-room1-like synthetic
sequence, run on the real TPU chip.

No dataset files ship with this machine (data/EuRoC and data/KITTI360 are
empty placeholders in the reference too), so the benchmark generates a
physically-consistent synthetic sequence with the TUM-VI room1 camera
(Kannala-Brandt 512x512, config/tum_vi_room1.yaml), 20fps camera / 200Hz
IMU, realistic sensor noise and biases, and exact ground truth.

Measures:
  * streaming fps  — the per-frame push API (VIOEngine.process_features),
  * chunked fps    — the lax.scan serving mode (engine/chunked.py), which is
    the headline number (north star: >=200 fps/chip, BASELINE.json),
  * ATE RMSE (Sim3 + SE3) against ground truth.

Prints ONE JSON line with the driver contract keys.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
# Full f32 precision on the MXU: the bias-chain weights span ~1e15, which
# bf16-pass matmuls cannot represent.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache inside the repo: the driver re-runs this
# bench on the same machine every round, and compiles dominate wall-clock
# (the round-4 run hit the driver timeout, BENCH_r04.json rc=124). Cached
# executables make repeat runs land comfortably inside the budget.
try:
    import os as _os
    _cache_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                               ".xla_cache")
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from mobile_slam_tpu.config import (CameraConfig, EstimatorConfig,
                                    TrackerConfig, VIOConfig)
from mobile_slam_tpu.engine import chunked, estimator as est
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine
from mobile_slam_tpu.eval import simulation as sim
from mobile_slam_tpu.eval.evaluator import compute_ate
from mobile_slam_tpu.models.cameras.base import make_camera

R_IC = np.array([[0.0, 0.0, 1.0],
                 [-1.0, 0.0, 0.0],
                 [0.0, -1.0, 0.0]])

DURATION = float(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--duration=")), 30.0))
# Image-path phase length (rendered frames are host-side-expensive to
# generate, not to process; 15 s = 300 frames is plenty for a rate).
IMG_DURATION = float(next((a.split("=")[1] for a in sys.argv
                           if a.startswith("--img-duration=")), 15.0))
CHUNK = 50
FLEET_B = 4   # concurrent sequences in the fleet image-path phase
BASELINE_FPS = 200.0  # north star: >=200 frames/sec/chip (BASELINE.md)

# Wall-clock budget (s). The driver runs this under an external timeout;
# round 4 blew it (BENCH_r04.json rc=124, no contract JSON — the whole round
# lost its official numbers). The REQUIRED phases (stream, chunked, image
# path) always run; the optional phases (feature fleet, image fleet,
# capacity) are skipped when not enough budget remains, so the contract
# JSON line always lands.
BUDGET = float(next((a.split("=")[1] for a in sys.argv
                     if a.startswith("--budget=")), 450.0))
_T0 = time.perf_counter()


def time_left():
    return BUDGET - (time.perf_counter() - _T0)


def phase_note(name):
    print(f"[bench] t={time.perf_counter() - _T0:.0f}s {name}",
          file=sys.stderr)

# A/B hooks for the solver budget (scripts/dev_multiseed.py is the accuracy
# side of the A/B; these flags are the fps side). Default 3 LM iterations:
# with the square-root prior the image-path multiseeds show 3 == 5 == 8
# (8 seeds x 14 s AND 2 seeds x 140 s, where the 3-iter fast package is
# slightly better: 0.024 vs 0.030 m — artifacts/multiseed_it3_ransac32.json,
# multiseed_140_fastpkg.json). The earlier "8 needed" sweep was a
# dense-prior artifact. Round 3: 2 == 3 as well (8x14s multiseed median
# 0.010 vs 0.011 m + 2x140s confirm 0.025/0.029 m, 0 gate trips —
# artifacts/multiseed_iters2.json, multiseed_140_iters2.json).
ITERS = int(next((a.split("=")[1] for a in sys.argv
                  if a.startswith("--iters=")), 2))
_FTOL = next((a.split("=")[1] for a in sys.argv
              if a.startswith("--ftol=")), None)
if _FTOL is not None:
    from mobile_slam_tpu.solver import lm as _lm
    _lm.EARLY_EXIT_FTOL = None if _FTOL in ("none", "off") else float(_FTOL)
# Tracker-side A/B hooks (accuracy side: dev_multiseed.py arm tokens
# ransac=/anchiters=/maxpts=; this is the fps side). Defaults follow
# TrackerConfig so config-default flips propagate here automatically.
RANSAC_ITERS = int(next((a.split("=")[1] for a in sys.argv
                         if a.startswith("--ransac=")),
                        TrackerConfig.ransac_iters))
ANCHOR_ITERS = int(next((a.split("=")[1] for a in sys.argv
                         if a.startswith("--anchiters=")),
                        TrackerConfig.anchor_iters))
MAX_POINTS = int(next((a.split("=")[1] for a in sys.argv
                       if a.startswith("--maxpts=")),
                      TrackerConfig.max_points))
# Accept both the bare form (--batchcand) and the value form used by the
# sibling flags / dev_multiseed arm tokens (--batchcand=0/1).
_BATCHCAND = next((a.split("=")[1] for a in sys.argv
                   if a.startswith("--batchcand=")),
                  "1" if "--batchcand" in sys.argv else "0")
if _BATCHCAND not in ("0", "false", "off"):
    from mobile_slam_tpu.solver import lm as _lm2
    _lm2.BATCH_CANDIDATES = True


def make_cfg():
    cam = CameraConfig(
        model_type="KANNALA_BRANDT", width=512, height=512,
        focal_length=190.97847715128717,
        fx=190.97847715128717, fy=190.9733070521226,
        cx=254.93170605935475, cy=256.8974428996504,
        dist=(0.0034823894022493434, 0.0007150348452162257,
              -0.0020532361418706202, 0.00020293673591811182),
        r_ic=tuple(R_IC.reshape(-1)), t_ic=(0.045, 0.073, -0.044),
    )
    return VIOConfig(
        camera=cam,
        tracker=TrackerConfig(max_cnt=150, min_dist=20, max_points=MAX_POINTS,
                              fisheye=True, ransac_iters=RANSAC_ITERS,
                              anchor_iters=ANCHOR_ITERS),
        estimator=EstimatorConfig(
            max_features=384, max_imu_per_interval=16, num_iterations=ITERS,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
        ),
    )


def frame_input(cfg, data, fi, t0, dtype=jnp.float32):
    f = data.frames[fi]
    t1 = data.cam_ts[fi]
    tp = data.cam_ts[fi - 1] if fi > 0 else t1 - 0.05
    dt, acc, gyr = sim.imu_between(data, tp, t1)
    k_pad = cfg.tracker.max_points
    m_pad = cfg.estimator.max_imu_per_interval
    n, m = len(f["ids"]), min(len(dt), m_pad)

    def pad(a, n_p, sh):
        out = np.zeros((n_p,) + sh)
        out[:len(a)] = a[:n_p]
        return out

    ids = np.full(k_pad, -1, np.int32)
    ids[:n] = f["ids"][:k_pad]
    return est.FrameInput(
        ts=jnp.asarray(t1 - t0, dtype),
        ids=jnp.asarray(ids),
        obs=jnp.asarray(pad(f["rays"], k_pad, (3,)), dtype),
        uv=jnp.asarray(pad(f["uv"], k_pad, (2,)), dtype),
        vel=jnp.asarray(pad(f["vel"], k_pad, (2,)), dtype),
        valid=jnp.asarray(np.arange(k_pad) < n),
        imu_dt=jnp.asarray(pad(dt, m_pad, ()), dtype),
        imu_acc=jnp.asarray(pad(acc, m_pad, (3,)), dtype),
        imu_gyr=jnp.asarray(pad(gyr, m_pad, (3,)), dtype),
        imu_cnt=jnp.asarray(m, jnp.int32),
    )


def run_capacity(cfg, data):
    """Reference-scale solver capacity: 1024 landmark slots (reference
    NUM_OF_FEATURES=1000, include/utility/config.h:12) with max_cnt=150
    live tracks. Measures the chunked feature-path rate at that shape.
    Returns fps (0.0 if init failed)."""
    cfg_cap = VIOConfig(
        camera=cfg.camera,
        tracker=TrackerConfig(max_cnt=150, min_dist=20, max_points=256,
                              fisheye=True),
        estimator=EstimatorConfig(
            max_features=1024, max_imu_per_interval=16, num_iterations=ITERS,
            acc_n=0.04, gyr_n=0.004, acc_w=4e-4, gyr_w=2e-5,
        ),
    )
    engine = VIOEngine(cfg_cap, jnp.float32)
    imu_i = 0
    init_frame = None
    fi = 0
    n = len(data.frames)
    while fi < n:
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
        if init_frame is not None and fi >= init_frame + 3:
            break
    if init_frame is None:
        return 0.0
    step = chunked.make_chunked_step(engine.params,
                                     cfg_cap.estimator.num_iterations)
    state = engine.state
    t0_seq = engine._t0
    batches = []
    n_cap = min(fi + 4 * CHUNK, n)
    while fi + CHUNK <= n_cap:
        inputs = [frame_input(cfg_cap, data, fi + k, t0_seq)
                  for k in range(CHUNK)]
        batches.append(jax.device_put(chunked.stack_frame_inputs(inputs)))
        fi += CHUNK
    if not batches:
        return 0.0
    state, out0 = step(state, batches[0])  # compile + warmup
    jax.block_until_ready(out0[0])
    t_s = time.perf_counter()
    outs = []
    for batch in batches[1:]:
        state, out = step(state, batch)
        outs.append(out)
    if outs:
        jax.block_until_ready(outs[-1][0])
        return CHUNK * len(outs) / (time.perf_counter() - t_s)
    # Single chunk available: retime it.
    t_s = time.perf_counter()
    state, out = step(state, batches[0])
    jax.block_until_ready(out[0])
    return CHUNK / (time.perf_counter() - t_s)


def run_image_path(cfg, cam, data):
    """Stream rendered frames until init, then chunked image-path serving.

    Returns (fps_image, ate_sim3_rmse, n_poses, n_frames, fps_fleet)."""
    import os
    n_img = min(int(IMG_DURATION * 20.0), len(data.frames))
    # Host-side splat rendering costs ~50 s per run but is deterministic
    # (seeded sim + deterministic renderer), so cache it on disk — the
    # round-4 driver run spent 54 s here and then hit the timeout.
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "artifacts", "bench_frame_cache",
                         f"main_seed7_d{int(DURATION)}_n{n_img}_v1.npz")
    if os.path.exists(cache):
        frames = list(np.load(cache)["frames"])
        print(f"[bench] image path: loaded {len(frames)} cached frames",
              file=sys.stderr)
    else:
        print(f"[bench] image path: rendering {n_img} frames...",
              file=sys.stderr)
        t_r = time.perf_counter()
        frames = [sim.render_frame(data, fi, cam, R_IC, cfg.camera.t_ic_vec)
                  for fi in range(n_img)]
        print(f"[bench] rendered in {time.perf_counter()-t_r:.0f}s",
              file=sys.stderr)
        try:
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            np.savez_compressed(cache, frames=np.stack(frames))
        except Exception as e:  # cache is best-effort
            print(f"[bench] frame-cache write failed: {e}", file=sys.stderr)
    return _image_path_core(cfg, data, frames, fleet=True)


def _image_path_core(cfg, data, frames, fleet=False):
    """Run the full image path over pre-rendered frames: stream until init,
    then chunked serving. Shared by the standard image-path phase and the
    adversarial degradation-curve phase (which renders through the
    independent OpenCV oracle, eval/adversarial.py)."""
    n_img = len(frames)
    engine = VIOEngine(cfg, jnp.float32)
    est_ts, est_p = [], []
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
        if res.ok:
            p, _, _ = engine.get_body_state()
            est_ts.append(ts)
            est_p.append(p)
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
            print(f"[bench] image path initialized at frame {init_frame}",
                  file=sys.stderr)
        if init_frame is not None and fi >= init_frame + 3:
            break
    if init_frame is None:
        return 0.0, float("nan"), 0, n_img, 0.0

    step_img = chunked.make_chunked_image_step(
        engine.params, cfg.estimator.num_iterations, cfg.tracker,
        engine.camera, cfg.camera.focal_length,
    )
    carry = chunked.ImageChunkCarry(
        est_state=engine.state, tracker_state=engine.tracker_state,
        banned_ids=engine._banned_ids, key=engine._key,
        depth_ema=jnp.asarray(engine._depth_ema or 0.0, jnp.float32),
        vel_ema=jnp.asarray(engine._vel_ema, jnp.float32),
    )
    t0_seq = engine._t0
    dtype = jnp.float32
    batches, chunk_starts = [], []
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
        batches.append(jax.device_put(chunked.stack_image_inputs(inputs)))
        chunk_starts.append(fi)
        fi += CHUNK

    fps_image = 0.0
    outs = []
    if batches:
        carry, out0 = step_img(carry, batches[0])
        jax.block_until_ready(out0[0])
        outs.append(out0)
        t_s = time.perf_counter()
        for batch in batches[1:]:
            carry, out = step_img(carry, batch)
            outs.append(out)
        jax.block_until_ready(outs[-1][0])
        wall = time.perf_counter() - t_s
        n_chunked = CHUNK * (len(batches) - 1)
        if n_chunked:
            fps_image = n_chunked / wall
        elif len(batches) == 1:
            # Single chunk: time a second pass over the same chunk.
            t_s = time.perf_counter()
            carry, out = step_img(carry, batches[0])
            jax.block_until_ready(out[0])
            fps_image = CHUNK / (time.perf_counter() - t_s)

    for start, (p_out, q_out, ok, kf) in zip(chunk_starts, outs):
        p_np = np.asarray(p_out, np.float64)
        ok_np = np.asarray(ok)
        for k in range(CHUNK):
            if ok_np[k]:
                est_ts.append(data.cam_ts[start + k])
                est_p.append(p_np[k])

    ate = float("nan")
    if len(est_p) > 10:
        ate = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                          data.cam_ts, data.gt_p, with_scale=True).rmse
    print(f"[bench] fps_image_path={fps_image:.1f} ate_img_sim3={ate:.3f}m "
          f"poses={len(est_p)}/{n_img}", file=sys.stderr)

    # Fleet mode: B concurrent sequences' full image pipelines vmapped into
    # one program (parallel/batch.py) — a single 512x512 stream
    # underutilizes the chip, so aggregate throughput is the TPU-native
    # scaling headline. Same warmed carry replicated B ways (identical
    # per-sequence work; batching economics don't depend on the data).
    fps_fleet = 0.0
    if fleet and batches and carry is not None and time_left() < 110.0:
        print(f"[bench] skipping image fleet (t_left={time_left():.0f}s)",
              file=sys.stderr)
        fleet = False
    if fleet and batches and carry is not None:
        from mobile_slam_tpu.parallel import batch as pbatch
        B = FLEET_B
        bstep = pbatch.make_batched_image_step(
            engine.params, cfg.estimator.num_iterations, cfg.tracker,
            engine.camera, cfg.camera.focal_length,
        )
        bcarry = jax.tree.map(
            lambda x: jnp.stack([x] * B), carry)
        # Real chunk data per rep (LK early-exit is data-dependent, so
        # timing on replayed garbage would flatter the rate).
        bbatches = [jax.tree.map(lambda x: jnp.stack([x] * B, axis=1), b)
                    for b in batches]
        bcarry, bout = bstep(bcarry, bbatches[0])     # compile + warmup
        jax.block_until_ready(bout[0])
        t_s = time.perf_counter()
        reps = 0
        for b in bbatches[1:] or bbatches:
            bcarry, bout = bstep(bcarry, b)
            reps += 1
        jax.block_until_ready(bout[0])
        fps_fleet = B * CHUNK * reps / (time.perf_counter() - t_s)
        print(f"[bench] fps_image_fleet{B}={fps_fleet:.1f} "
              f"({fps_fleet / B:.1f}/seq)", file=sys.stderr)

    return fps_image, ate, len(est_p), n_img, fps_fleet


def _image_path_recovering(cfg, data, frames):
    """Full image path through ChunkedImageServer (engine/serving.py):
    chunked scans while healthy, rebuild-and-continue streaming re-init
    when a chunk tail goes bad — the reference's failure story
    (vio_engine.cpp:248-279) at serving granularity. Returns
    (fps, ate_sim3, poses, n_frames, n_recoveries).

    Serving chunk is 25 (not the throughput bench's 50): a mid-chunk gate
    trip loses up to chunk_size - recover_tail poses before the host sees
    the chunk, so under nuisances the smaller scan roughly halves the
    per-event pose loss at negligible throughput cost."""
    from mobile_slam_tpu.engine.serving import ChunkedImageServer

    adv_chunk = int(next((a.split("=")[1] for a in sys.argv
                          if a.startswith("--adv-chunk=")), 25))
    server = ChunkedImageServer(cfg, jnp.float32, chunk_size=adv_chunk)
    est_ts, est_p = [], []
    imu_i = 0
    t_start = time.perf_counter()
    for fi in range(len(frames)):
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            server.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        for r in server.process_frame(frames[fi], ts):
            if r.ok:
                est_ts.append(r.ts)
                est_p.append(r.p)
    for r in server.flush():
        if r.ok:
            est_ts.append(r.ts)
            est_p.append(r.p)
    wall = time.perf_counter() - t_start
    fps = len(frames) / wall if wall > 0 else 0.0
    ate = float("nan")
    if len(est_p) > 10:
        ate = compute_ate(np.asarray(est_ts), np.asarray(est_p, np.float64),
                          data.cam_ts, data.gt_p, with_scale=True).rmse
    return fps, ate, len(est_p), len(frames), server.n_recoveries


def run_adversarial_bench():
    """ATE degradation curve vs nuisance level (VERDICT r2 'de-circularize').

    Every frame is rendered through the INDEPENDENT OpenCV geometry oracle
    (eval/adversarial.py) — not through the camera code the tracker lifts
    with — and each level adds real-sensor nuisances the estimator's noise
    model does not contain (exposure flicker, vignetting, motion blur,
    colored IMU noise, accel scale error, camera-IMU time offset, moving
    objects). Level 0 is the clean-oracle arm: it isolates the circularity
    question (same physics as the standard bench, independent renderer).
    Prints one JSON line with ate per level.
    """
    from mobile_slam_tpu.eval import adversarial as adv

    cfg = make_cfg()
    use_td = "--adv-td" in sys.argv
    if use_td:
        # Online camera-IMU time-offset estimation (beyond the reference;
        # docs/analysis-report.md:408-418 lists td as missing there). The
        # level-2+ nuisance set injects a real +2 ms offset, so this arm
        # measures the td estimator against the nuisance it targets.
        import dataclasses as _dc
        cfg = _dc.replace(
            cfg, estimator=_dc.replace(cfg.estimator, estimate_td=True))
    levels = sorted(int(s) for s in next(
        (a.split("=")[1] for a in sys.argv
         if a.startswith("--adv-levels=")), "0,1,2,3,4").split(","))
    duration = float(next((a.split("=")[1] for a in sys.argv
                           if a.startswith("--adv-duration=")), 12.0))
    seeds = [int(s) for s in next(
        (a.split("=")[1] for a in sys.argv
         if a.startswith("--adv-seeds=")), "11").split(",")]

    # Optional camera-IMU offset override (seconds): an uncalibrated phone
    # carries tens of ms of offset; the preset levels inject only 2-5 ms,
    # where online td estimation is near-neutral end-to-end. The td A/B at
    # a realistic 15 ms is the arm that shows the estimator's value.
    offset_override = next((a.split("=")[1] for a in sys.argv
                            if a.startswith("--adv-offset=")), None)

    results = []
    for lvl in levels:
        nuis = adv.LEVELS[lvl]
        if offset_override is not None:
            import dataclasses as _dc2
            nuis = _dc2.replace(nuis,
                                cam_time_offset_s=float(offset_override))
        for seed in seeds:
            scfg = sim.SimConfig(
                duration=duration, cam_rate=20.0, imu_rate=200.0,
                num_landmarks=900, max_features=150,
                acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.0,
                acc_bias=(0.01, -0.005, 0.015),
                gyr_bias=(0.001, -0.0005, 0.0008), seed=seed,
            )
            data = adv.make_adversarial_data(
                scfg, cfg.camera, R_IC, np.asarray(cfg.camera.t_ic_vec), nuis)
            cache_dir = next((a.split("=")[1] for a in sys.argv
                              if a.startswith("--adv-cache=")), None)
            cache = None
            if cache_dir:
                import os
                os.makedirs(cache_dir, exist_ok=True)
                cache = os.path.join(
                    cache_dir, f"frames_l{lvl}_s{seed}_d{int(duration)}.npz")
            if cache and os.path.exists(cache):
                frames = list(np.load(cache)["frames"])
            else:
                movers = adv.make_movers(nuis)
                t_r = time.perf_counter()
                frames = [adv.render_frame_adversarial(
                    data, fi, cfg.camera, R_IC,
                    np.asarray(cfg.camera.t_ic_vec),
                    nuis, movers) for fi in range(len(data.cam_ts))]
                print(f"[bench-adv] level {lvl} seed {seed}: rendered "
                      f"{len(frames)} oracle frames in "
                      f"{time.perf_counter()-t_r:.0f}s", file=sys.stderr)
                if cache:
                    np.savez_compressed(cache, frames=np.stack(frames))
            fps, ate, poses, n_img, n_rec = _image_path_recovering(
                cfg, data, frames)
            results.append({
                "level": lvl, "seed": seed,
                "ate_sim3_m": None if ate != ate else round(ate, 4),
                "poses": poses, "frames": n_img, "fps": round(fps, 1),
                "recoveries": n_rec,
            })
            print(f"[bench-adv] level {lvl} seed {seed}: "
                  f"ATE {ate:.4f} m, {poses}/{n_img} poses, {fps:.1f} fps, "
                  f"{n_rec} recoveries", file=sys.stderr)
    print(json.dumps({
        "metric": "adversarial ATE degradation curve (oracle renderer)",
        "unit": "m", "duration_s": duration, "estimate_td": use_td,
        "arms": results,
    }))


def _probe_devices(timeout_s: float = 600.0):
    """jax.devices() with a watchdog: the axon TPU tunnel can wedge (hangs
    indefinitely at backend init). A hung bench is worse than an error line
    for the driver, so probe in a daemon thread and fail fast."""
    import threading
    box = []
    t = threading.Thread(target=lambda: box.append(jax.devices()),
                         daemon=True)
    t.start()
    t.join(timeout_s)
    return box[0] if box else None


def main():
    if "--sqrt" in sys.argv or "--dense-prior" in sys.argv:
        # A/B hooks for the prior factorization (default: full square-root
        # pipeline; factors/marginalization.py SQRT_MARGIN_OLD note).
        from mobile_slam_tpu.factors import marginalization
        marginalization.enable_sqrt_pipeline("--sqrt" in sys.argv)
    if _probe_devices() is None:
        print(json.dumps({
            "metric": "VIO frames/sec/chip (TUM-VI-like synthetic, chunked)",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": "TPU backend unavailable (device probe timed out)",
        }))
        return
    if "--adversarial" in sys.argv:
        run_adversarial_bench()
        return
    cfg = make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    scfg = sim.SimConfig(
        duration=DURATION, cam_rate=20.0, imu_rate=200.0,
        num_landmarks=900, max_features=150,
        acc_noise=0.02, gyr_noise=0.002, pixel_noise=0.25,
        acc_bias=(0.01, -0.005, 0.015), gyr_bias=(0.001, -0.0005, 0.0008),
        seed=7,
    )
    data = sim.simulate(scfg, cam, cfg.camera.r_ic_mat, cfg.camera.t_ic_vec)
    n_frames = len(data.frames)
    print(f"[bench] {n_frames} frames, {DURATION}s, "
          f"device={jax.devices()[0]}", file=sys.stderr)

    engine = VIOEngine(cfg, jnp.float32)

    # --- Phase 1: streaming until initialized + a measurement stretch. ---
    # After init the per-frame push API runs in PIPELINED mode (one-frame
    # lag, vio_engine.enable_pipelined_streaming): each call dispatches this
    # frame and returns the previous frame's pose whose async device->host
    # copy has had a full frame interval to arrive — so the measured rate is
    # device-bound, not tunnel-RTT-bound (the reference's real-time push
    # contract, include/vio_engine.h:57-60).
    r_ic_mat = cfg.camera.r_ic_mat
    t_ic_vec = cfg.camera.t_ic_vec

    def pose_to_body(pose):
        r_wb = pose[:3, :3] @ r_ic_mat.T
        return pose[:3, 3] - r_wb @ t_ic_vec

    est_ts, est_p = [], []
    imu_i = 0
    init_frame = None
    stream_times = []
    fi = 0
    while fi < n_frames:
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        f = data.frames[fi]
        t_s = time.perf_counter()
        res = engine.process_features(ts, f["ids"], f["rays"],
                                      uv=f["uv"], vel=f["vel"])
        dt_call = time.perf_counter() - t_s
        if res.ok and res.pose is not None:
            est_ts.append(res.ts if res.ts is not None else ts)
            est_p.append(pose_to_body(res.pose))
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi
            # depth=8: enough frames in flight that the tunnel RTT (~100 ms)
            # amortizes below device time; pose latency is 8 frames.
            engine.enable_pipelined_streaming(True, depth=8)
            print(f"[bench] initialized at frame {fi} (pipelined streaming "
                  f"on, depth=8)", file=sys.stderr)
        if init_frame is not None and fi > init_frame + 12:
            stream_times.append(dt_call)
        fi += 1
        # 60 post-init frames: ~48 timing samples for the median. The
        # streaming phase is tunnel-RTT-bound (100-200 s wall observed on
        # identical code), so its length is budget margin for the phases
        # that carry the headline numbers.
        if init_frame is not None and fi >= init_frame + 60:
            break
    for tail in engine.flush_all():
        if tail.ok and tail.pose is not None:
            est_ts.append(tail.ts)
            est_p.append(pose_to_body(tail.pose))
    engine.enable_pipelined_streaming(False)
    if init_frame is None:
        print(json.dumps({
            "metric": "VIO frames/sec/chip (TUM-VI-like synthetic)",
            "value": 0.0, "unit": "fps", "vs_baseline": 0.0,
            "error": "initialization failed",
        }))
        return
    phase_note("phase1 (streaming) done")
    fps_stream = 1.0 / float(np.median(stream_times))
    # Device-bound split (VERDICT r2 weak #6): wall-clock streaming fps over
    # the tunnel swings ~2x with RTT on identical code; this re-dispatches
    # the same per-frame step back-to-back with no host reads and reports
    # pure device throughput, which is reproducible.
    stream_device_ms = engine.measure_device_step(50)

    # --- Phase 2: chunked serving mode for the rest of the sequence. -----
    # All chunk inputs are staged up front and the chunks are dispatched
    # back-to-back WITHOUT host synchronization in between: consecutive
    # device programs pipeline on-chip (JAX async dispatch), so the measured
    # rate is sustained device throughput, not host<->chip round-trip
    # latency (this machine reaches the chip through a network tunnel).
    step_chunk = chunked.make_chunked_step(
        engine.params, cfg.estimator.num_iterations
    )
    state = engine.state
    t0_seq = engine._t0
    batches = []
    chunk_starts = []
    while fi + CHUNK <= n_frames:
        inputs = [frame_input(cfg, data, fi + k, t0_seq)
                  for k in range(CHUNK)]
        batches.append(jax.device_put(chunked.stack_frame_inputs(inputs)))
        chunk_starts.append(fi)
        fi += CHUNK

    n_chunked = 0
    fps_chunked = fps_stream
    outs = []
    if batches:
        # Warmup chunk (compile) — results kept, timing excluded.
        state, out0 = step_chunk(state, batches[0])
        jax.block_until_ready(out0[0])
        outs.append(out0)
        t_s = time.perf_counter()
        for batch in batches[1:]:
            state, out = step_chunk(state, batch)
            outs.append(out)
        jax.block_until_ready(outs[-1][0])
        wall = time.perf_counter() - t_s
        n_chunked = CHUNK * (len(batches) - 1)
        if n_chunked:
            fps_chunked = n_chunked / wall

    for start, (p_out, q_out, ok, kf) in zip(chunk_starts, outs):
        p_np = np.asarray(p_out, np.float64)
        q_np = np.asarray(q_out, np.float64)
        ok_np = np.asarray(ok)
        for k in range(CHUNK):
            if ok_np[k]:
                est_ts.append(data.cam_ts[start + k])
                est_p.append(p_np[k])

    phase_note("phase2 (chunked) done")
    # --- Phase 2b: FEATURE-PATH FLEET (B sequences vmapped) --------------
    # The solver's small dense ops (165-dim Schur/Cholesky, window math)
    # are latency-bound, so widening them B-fold is nearly free — this is
    # the per-chip aggregate-throughput scaling axis (multi-chip DP shards
    # the same batch over a mesh, parallel/batch.py). Timing replays the
    # staged chunks against a replicated end-state: the feature path has no
    # data-dependent iteration counts, so the rate is data-independent.
    fps_feature_fleet = 0.0
    if len(batches) >= 2 and time_left() < 170.0:
        print(f"[bench] skipping feature fleet (t_left={time_left():.0f}s)",
              file=sys.stderr)
    elif len(batches) >= 2:
        from mobile_slam_tpu.parallel import batch as pbatch
        Bf = 8
        fstep = pbatch.make_batched_chunked_step(
            engine.params, cfg.estimator.num_iterations)
        fstate = jax.tree.map(lambda x: jnp.stack([x] * Bf), state)
        fbatches = [jax.tree.map(lambda x: jnp.stack([x] * Bf, axis=1), b)
                    for b in batches]
        fstate, fout = fstep(fstate, fbatches[0])   # compile + warmup
        jax.block_until_ready(fout[0])
        t_s = time.perf_counter()
        for b in fbatches[1:]:
            fstate, fout = fstep(fstate, b)
        jax.block_until_ready(fout[0])
        fps_feature_fleet = (Bf * CHUNK * (len(fbatches) - 1)
                             / (time.perf_counter() - t_s))
        print(f"[bench] fps_feature_fleet{Bf}={fps_feature_fleet:.1f} "
              f"({fps_feature_fleet / Bf:.1f}/seq)", file=sys.stderr)

    phase_note("phase2b (feature fleet) done")
    # --- Phase 3: FULL IMAGE PATH (tracker inside the scan) --------------
    # The reference's hot loop is detectAndTrack + processImage
    # (vio_engine.cpp:209-243); this phase measures the same thing: rendered
    # frames are pre-staged on device and each chunk runs CLAHE + pyramid +
    # LK(+FB/anchor) + RANSAC + Shi-Tomasi + the full filter per frame.
    (fps_image, ate_img_sim3, img_poses, n_img_frames,
     fps_image_fleet) = run_image_path(cfg, cam, data)

    phase_note("phase3 (image path) done")
    # --- Phase 4: reference-scale capacity (1024 landmark slots). --------
    if time_left() < 100.0:
        print(f"[bench] skipping capacity phase (t_left={time_left():.0f}s)",
              file=sys.stderr)
        fps_capacity = 0.0
    else:
        fps_capacity = run_capacity(cfg, data)
        print(f"[bench] fps_capacity_1024slots={fps_capacity:.1f}",
              file=sys.stderr)
    phase_note("phase4 (capacity) done")

    # --- Accuracy -------------------------------------------------------
    est_ts = np.asarray(est_ts)
    est_p = np.asarray(est_p, np.float64)
    ate_sim3 = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                           with_scale=True)
    ate_se3 = compute_ate(est_ts, est_p, data.cam_ts, data.gt_p,
                          with_scale=False)
    dev_str = ("n/a" if stream_device_ms is None
               else f"{stream_device_ms:.2f}ms ({1e3 / stream_device_ms:.1f} fps)")
    print(f"[bench] stream_device_step={dev_str}", file=sys.stderr)
    print(f"[bench] fps_stream={fps_stream:.1f} fps_chunked={fps_chunked:.1f} "
          f"ATE sim3={ate_sim3.rmse:.3f}m se3={ate_se3.rmse:.3f}m "
          f"poses={len(est_p)}/{n_frames}", file=sys.stderr)

    print(json.dumps({
        "metric": "VIO frames/sec/chip (TUM-VI-like synthetic, chunked)",
        "value": round(fps_chunked, 2),
        "unit": "fps",
        "vs_baseline": round(fps_chunked / BASELINE_FPS, 3),
        "fps_streaming": round(fps_stream, 2),
        "stream_device_ms": (None if stream_device_ms is None
                             else round(stream_device_ms, 3)),
        "fps_stream_device": (None if stream_device_ms is None
                              else round(1e3 / stream_device_ms, 2)),
        "fps_image_path": round(fps_image, 2),
        "fps_image_fleet4": round(fps_image_fleet, 2),
        "fps_feature_fleet8": round(fps_feature_fleet, 2),
        "fps_capacity_1024slots": round(fps_capacity, 2),
        "ate_sim3_rmse_m": round(ate_sim3.rmse, 4),
        "ate_se3_rmse_m": round(ate_se3.rmse, 4),
        "ate_image_path_sim3_m": (None if ate_img_sim3 != ate_img_sim3
                                  else round(ate_img_sim3, 4)),
        "image_path_poses": img_poses,
        "image_path_frames": n_img_frames,
        "poses": len(est_p),
        "frames": n_frames,
    }))


if __name__ == "__main__":
    main()
