"""Measure per-pallas-call overhead INSIDE a lax.scan on the chip.

The tracker step makes 5 pallas calls per frame (track, fb extract, fb
refine, anchor refine, anchor extract). If each call boundary carries a
fixed cost (kernel launch, SMEM<->XLA layout conversion, pipeline drain),
fusing them is worth more than optimizing their bodies. This probe scans
50 steps, each step invoking a small SMEM-in/SMEM-out kernel N times on a
(160, 2) carry with a realistic VMEM image operand, and reports ms/step
vs N — the slope is the per-call overhead.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_call_overhead.py
"""

import functools
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 160
H = W = 512
STEPS = 50


def _tiny_kernel(pts_ref, img_ref, out_ref):
    # Touch the image (one block) and every point slot: a lower bound on
    # what any real per-point kernel must do.
    blk = img_ref[pl.ds(0, 8), pl.ds(0, 128)]
    s = jnp.sum(blk) * 1e-12

    def one(k, _):
        out_ref[k, 0] = pts_ref[k, 0] + s
        out_ref[k, 1] = pts_ref[k, 1] + s
        return 0

    jax.lax.fori_loop(0, K, one, 0)


def _call(pts, img):
    return pl.pallas_call(
        _tiny_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(pts, img)


def build(n_calls):
    @jax.jit
    def run(pts, imgs):
        def step(c, img):
            for _ in range(n_calls):
                c = _call(c, img)
            if n_calls == 0:
                c = c + img[0, 0] * 1e-12
            return c, c[0, 0]
        return jax.lax.scan(step, pts, imgs)

    return run


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(30, 480, (K, 2)).astype(np.float32))
    imgs = jnp.asarray(
        rng.uniform(0, 255, (STEPS, H, W)).astype(np.float32))

    for n in (0, 1, 2, 5):
        run = build(n)
        out, _ = run(pts, imgs)
        jax.block_until_ready(out)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out, _ = run(pts, imgs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / (10 * STEPS))
        print(f"calls/step={n}: {best*1e3:7.4f} ms/step", flush=True)


if __name__ == "__main__":
    main()
