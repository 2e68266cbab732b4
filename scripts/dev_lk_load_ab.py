"""A/B the LK kernel's block-load path on the real chip: aligned-superblock
+ dual-roll (_load_block) vs legacy one-hot-matmul lane select
(_load_block_matmul). Checks bit-level parity and times both.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_lk_load_ab.py
"""

import sys
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.ops import image as im, lk, lk_pallas

K = 192
H = W = 512
WIN = 21
LEVELS = 3


def main():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 8, W + 8)).astype(np.float32)
    # Smooth textured pair with a known shift so LK has real work.
    img0 = im.box_filter(jnp.asarray(base[4:4 + H, 4:4 + W]), 5)
    img1 = im.box_filter(jnp.asarray(base[1:1 + H, 7:7 + W]), 5)  # (+3,-3)
    pyr0 = tuple(im.build_pyramid(img0, LEVELS))
    pyr1 = tuple(im.build_pyramid(img1, LEVELS))
    pts = jnp.asarray(
        rng.uniform(30, H - 30, (K, 2)).astype(np.float32))
    active = jnp.ones((K,), bool)
    params = lk.LKParams(window=WIN, levels=LEVELS, iters=30, eps=0.01)

    fn = jax.jit(lambda a, b, p, m: lk_pallas._track_pyramidal(
        a, b, p, m, params))

    results = {}
    for mode in ("roll", "matmul"):
        lk_pallas.USE_ROLL_LOADS = mode == "roll"
        fn_m = jax.jit(lambda a, b, p, m, _mode=mode: (
            lk_pallas._track_pyramidal(a, b, p, m, params)))
        pos, ok = fn_m(pyr0, pyr1, pts, active)
        jax.block_until_ready(pos)
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            pos, ok = fn_m(pyr0, pyr1, pts, active)
        jax.block_until_ready(pos)
        dt = (time.perf_counter() - t0) / reps
        results[mode] = (np.asarray(pos), np.asarray(ok), dt)
        print(f"{mode:7s}: {dt*1e3:7.3f} ms/frame  "
              f"ok={int(results[mode][1].sum())}/{K}")

    # XLA oracle: the reference implementation both kernels must match.
    xla_fn = jax.jit(lambda a, b, p, m: lk.track_pyramidal(
        list(a), list(b), p, m, params))
    p_x, ok_x = jax.tree.map(np.asarray, xla_fn(pyr0, pyr1, pts, active))

    p_r, ok_r, _ = results["roll"]
    p_m, ok_m, _ = results["matmul"]
    both = ok_r & ok_m
    for name, (p, ok) in (("roll  vs matmul", (p_r, ok_m)),
                          ("roll  vs xla", (p_r, ok_x)),
                          ("matmul vs xla", (p_m, ok_x))):
        ref_p = p_m if "matmul" in name.split(" vs ")[1] else p_x
        common = ok_r & ok
        d = np.linalg.norm(p - ref_p, axis=1)[common]
        if d.size:
            print(f"{name:16s}: n={d.size:3d} median={np.median(d):.2e} "
                  f"p90={np.percentile(d, 90):.2e} max={d.max():.2e} px")
    # The true displacement is (-3, +3) in (x, y) (img1 content shifted).
    med = np.median(p_r[both] - np.asarray(pts)[both], axis=0)
    print(f"median displacement: {med} (expect ~[-3, +3])")
    speedup = results["matmul"][2] / results["roll"][2]
    print(f"speedup roll vs matmul: {speedup:.2f}x")


if __name__ == "__main__":
    main()
