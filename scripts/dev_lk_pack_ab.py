"""A/B the packed (PACK_POINTS=4) vs unpacked LK kernels on the chip:
bit-parity and per-call timing for track_pyramidal, refine_template and
extract_patches at production shapes (K=160, 512x512, 3 levels).

The packed kernels process P points per loop iteration as straight-line
masked code; results must be BIT-identical to the unpacked per-point
while_loop (see ops/lk_pallas.py PACK_POINTS).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_lk_pack_ab.py
"""

import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from mobile_slam_tpu.ops import image as im, lk, lk_pallas

K = 160
H = W = 512
WIN = 21
LEVELS = 3


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        reps = 30
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return out, best * 1e3


def main():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 8, W + 8)).astype(np.float32)
    img0 = im.box_filter(jnp.asarray(base[4:4 + H, 4:4 + W]), 5)
    img1 = im.box_filter(jnp.asarray(base[1:1 + H, 7:7 + W]), 5)
    pyr0 = tuple(im.build_pyramid(img0, LEVELS))
    pyr1 = tuple(im.build_pyramid(img1, LEVELS))
    pts = jnp.asarray(rng.uniform(30, H - 30, (K, 2)).astype(np.float32))
    active = jnp.asarray(rng.random(K) > 0.15)  # mixed active/inactive
    params = lk.LKParams(window=WIN, levels=LEVELS, iters=30, eps=0.01)

    results = {}
    for pack in (1, 4):
        # n_pack threaded explicitly (not via the PACK_POINTS global): each
        # pack value traces its own kernel, so jit caching can't cross arms.
        track = jax.jit(lambda a, b, p, m, _v=pack: (
            lk_pallas._track_pyramidal(a, b, p, m, params, n_pack=_v)))
        (pos, ok), t_track = timeit(track, pyr0, pyr1, pts, active)

        extract = jax.jit(lambda i, c, _v=pack: (
            lk_pallas._extract_patches(i, c, WIN, n_pack=_v)))
        (tp, gx, gy), t_ext = timeit(extract, img0, pts)

        refine = jax.jit(lambda *a, _v=pack: lk_pallas._refine_template(
            *a, WIN, 10, 0.01, 4.0, n_pack=_v))
        (rpos, rok, rres), t_ref = timeit(
            refine, img1, tp, gx, gy, pts, active)

        results[pack] = dict(
            pos=np.asarray(pos), ok=np.asarray(ok),
            tp=np.asarray(tp), gx=np.asarray(gx), gy=np.asarray(gy),
            rpos=np.asarray(rpos), rok=np.asarray(rok),
            rres=np.asarray(rres),
            t_track=t_track, t_ext=t_ext, t_ref=t_ref)
        print(f"pack={pack}: track {t_track:6.3f} ms  extract "
              f"{t_ext:6.3f} ms  refine {t_ref:6.3f} ms  "
              f"ok={int(np.asarray(ok).sum())}/{K}")

    a, b = results[1], results[4]
    for key in ("pos", "ok", "tp", "gx", "gy", "rpos", "rok", "rres"):
        same = np.array_equal(a[key], b[key])
        status = "BIT-EXACT" if same else (
            f"MAXDIFF {np.abs(a[key].astype(np.float64) - b[key].astype(np.float64)).max():.3e}")
        print(f"  {key:5s}: {status}")
    for t in ("t_track", "t_ext", "t_ref"):
        print(f"speedup {t}: {a[t] / b[t]:.2f}x ({a[t]:.3f} -> {b[t]:.3f} ms)")


if __name__ == "__main__":
    main()
