"""Per-frame cost attribution inside the REAL chunked image scan.

dev_dnt_breakdown.py ablates the single-dispatch tracker program, but each
dispatch carries ~1.2 ms of launch overhead that the 50-frame scan
amortizes away, so single-dispatch deltas do not predict chunk throughput.
This harness times the full chunked image step (the bench's Phase-3
program) with stages toggled per arm and reports ms/frame deltas.

Usage (chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_chunk_breakdown.py
Reuses /tmp/multiseed_cache renders when present (seed 100, 14 s).
"""

import dataclasses
import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
import bench  # noqa: E402
import dev_multiseed as dm  # noqa: E402  (make_data cache + CHUNK)

from mobile_slam_tpu.engine import chunked  # noqa: E402
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.solver import lm as lm_mod  # noqa: E402

CHUNK = 50
REP_CHUNKS = 4


def main():
    cfg = bench.make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data, frames = dm.make_data(100, cfg, cam)
    print(f"device={jax.devices()[0]} frames={len(frames)}", file=sys.stderr)

    engine = VIOEngine(cfg, jnp.float32)
    imu_i, fi, init_frame = 0, 0, None
    while fi < len(frames):
        ts = data.cam_ts[fi]
        while imu_i < len(data.imu_ts) and data.imu_ts[imu_i] <= ts + 1e-9:
            engine.push_imu(data.imu_ts[imu_i], data.imu_acc[imu_i],
                            data.imu_gyr[imu_i])
            imu_i += 1
        res = engine.process_frame(frames[fi].astype(np.float64), ts)
        fi += 1
        if init_frame is None and res.status == Status.TRACKING:
            init_frame = fi - 1
        if init_frame is not None and fi >= init_frame + 3:
            break
    assert init_frame is not None, "init failed"

    carry0 = chunked.ImageChunkCarry(
        est_state=engine.state, tracker_state=engine.tracker_state,
        banned_ids=engine._banned_ids, key=engine._key,
        depth_ema=jnp.asarray(engine._depth_ema or 0.0, jnp.float32),
        vel_ema=jnp.asarray(engine._vel_ema, jnp.float32),
    )
    t0_seq = engine._t0
    m_pad = cfg.estimator.max_imu_per_interval
    dtype = jnp.float32
    inputs = []
    for k in range(CHUNK):
        j = fi + k
        t1 = data.cam_ts[j]
        dt, acc, gyr = sim.imu_between(data, data.cam_ts[j - 1], t1)
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

    def time_arm(name, tcfg=None, iters=None, greedy=False, sqrt_mrg=True,
                 batchcand=False):
        from mobile_slam_tpu.factors import marginalization as mrg
        try:
            lm_mod.GREEDY_GN = greedy
            lm_mod.BATCH_CANDIDATES = batchcand
            mrg.enable_sqrt_pipeline(sqrt_mrg)
            step = chunked.make_chunked_image_step(
                engine.params, iters or cfg.estimator.num_iterations,
                tcfg or cfg.tracker, engine.camera, cfg.camera.focal_length)
            carry = jax.tree.map(jnp.copy, carry0)
            carry, out = step(carry, batch)         # compile + warmup
            jax.block_until_ready(out[0])
            t0 = time.perf_counter()
            for _ in range(REP_CHUNKS):
                carry, out = step(carry, batch)
            jax.block_until_ready(out[0])
            ms = 1e3 * (time.perf_counter() - t0) / (REP_CHUNKS * CHUNK)
        finally:
            lm_mod.GREEDY_GN = False
            lm_mod.BATCH_CANDIDATES = False
            mrg.enable_sqrt_pipeline(True)
        print(f"{name:40s} {ms:7.3f} ms/frame  ({1e3/ms:6.1f} fps)",
              flush=True)
        return ms

    base = cfg.tracker
    t_full = time_arm(f"full (iters={cfg.estimator.num_iterations})")
    time_arm("batched LM candidates (batchcand)", batchcand=True)
    time_arm("greedy GN candidate (timing only)", greedy=True)
    time_arm("extra-fast pkg (ransac=16 anchiters=4)",
             tcfg=dataclasses.replace(base, ransac_iters=16, anchor_iters=4))
    time_arm("extra-fast + batchcand",
             tcfg=dataclasses.replace(base, ransac_iters=16, anchor_iters=4),
             batchcand=True)
    time_arm("refill_min_deficit=4",
             tcfg=dataclasses.replace(base, refill_min_deficit=4))
    time_arm("refill_min_deficit=8",
             tcfg=dataclasses.replace(base, refill_min_deficit=8))
    time_arm("refill_min_deficit=16",
             tcfg=dataclasses.replace(base, refill_min_deficit=16))
    time_arm("fb_check off",
             tcfg=dataclasses.replace(base, fb_check=False))
    time_arm("anchor_refine off",
             tcfg=dataclasses.replace(base, anchor_refine=False))
    time_arm("ransac_iters=1",
             tcfg=dataclasses.replace(base, ransac_iters=1))
    time_arm("equalize (CLAHE) off",
             tcfg=dataclasses.replace(base, equalize=False))
    time_arm("dense-eigh marginalization (timing only)", sqrt_mrg=False)
    time_arm("iters=1 (timing only)", iters=1)
    t_min = time_arm(
        "all tracker extras off + iters=1",
        tcfg=dataclasses.replace(base, fb_check=False, anchor_refine=False,
                                 ransac_iters=1, equalize=False),
        iters=1)
    print(f"\nfull {t_full:.3f} -> floor {t_min:.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
