"""A/B PACK_POINTS (packed LK kernels) through the REAL chunked image
step — the bench's Phase-3 program — which is the only timing instrument
on this box that amortizes dispatch/tunnel overhead (50-frame scan).

Single-dispatch kernel timings over the axon tunnel are unreliable in
both directions (dispatch pipelining hides device time; per-call launch
overhead ~1.2 ms swamps small kernels), so the decision metric for the
packed kernels is ms/frame here, with bit-parity already established by
scripts/dev_lk_pack_ab.py.

Usage (chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_pack_chunk_ab.py
"""

import os
import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")
import bench  # noqa: E402
import dev_multiseed as dm  # noqa: E402

from mobile_slam_tpu.engine import chunked  # noqa: E402
from mobile_slam_tpu.engine.vio_engine import Status, VIOEngine  # noqa: E402
from mobile_slam_tpu.eval import simulation as sim  # noqa: E402
from mobile_slam_tpu.models.cameras.base import make_camera  # noqa: E402
from mobile_slam_tpu.ops import lk_pallas  # noqa: E402

# Engine warmup/init compiles a one-shot tracker program; pin it to the
# cheap-to-compile unpacked kernels (packed Mosaic compiles take minutes
# and the init result is pack-independent — kernels are bit-exact).
lk_pallas.PACK_POINTS = 1

CHUNK = 50
REP_CHUNKS = 4


def main():
    cfg = bench.make_cfg()
    cam = make_camera(cfg.camera, dtype=jnp.float64)
    data, frames = dm.make_data(100, cfg, cam)
    print(f"device={jax.devices()[0]} frames={len(frames)}",
          file=sys.stderr)

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
            imu_cnt=jnp.asarray(min(len(dt), m_pad), jnp.int32),
        ))
    batch = jax.device_put(chunked.stack_image_inputs(inputs))

    packs = tuple(int(p) for p in
                  os.environ.get("PACK_ARMS", "1,4").split(","))
    outs = {}
    for pack in packs:
        lk_pallas.PACK_POINTS = pack
        step = chunked.make_chunked_image_step(
            engine.params, cfg.estimator.num_iterations, cfg.tracker,
            engine.camera, cfg.camera.focal_length)
        carry = jax.tree.map(jnp.copy, carry0)
        carry, out = step(carry, batch)
        jax.block_until_ready(out[0])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REP_CHUNKS):
                carry2, out = step(carry, batch)
            jax.block_until_ready(out[0])
            best = min(best,
                       1e3 * (time.perf_counter() - t0)
                       / (REP_CHUNKS * CHUNK))
        outs[pack] = (jax.tree.map(np.asarray, out), best)
        print(f"pack={pack}: {best:7.3f} ms/frame  ({1e3/best:6.1f} fps)",
              flush=True)
    if len(packs) == 2:
        a, b = packs
        leaves_a = jax.tree.leaves(outs[a][0])
        leaves_b = jax.tree.leaves(outs[b][0])
        exact = all(np.array_equal(x, y)
                    for x, y in zip(leaves_a, leaves_b))
        print(f"chunk outputs bit-exact across pack={a}/{b}: {exact}")
        print(f"speedup: {outs[a][1] / outs[b][1]:.2f}x")


if __name__ == "__main__":
    main()
