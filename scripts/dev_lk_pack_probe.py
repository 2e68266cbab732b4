"""Attribute per-iteration cost inside the Pallas LK kernel on the chip.

The round-3 notes name multi-point lane-packing as the lever to cut the
LK/fb/anchor kernel time (ROUND3_NOTES.md "Round-4 perf lever"). Packing
only pays if the while-loop's VPU *arithmetic* dominates; if the
(32, 256) superblock fetch + dual roll dominates, packing P points per
iteration leaves the per-point loads serialized and the gain is small.

This probe times stripped single-level kernels with a FIXED fori-loop
iteration count (no early exit, so variants are load-for-load comparable):

  full    — load + bilinear + reductions + 2x2 solve per iteration
  noarith — load + bilinear only (solve replaced by constant step)
  noload  — reuse the template block; bilinear + reductions + solve
  empty   — loop body is scalar math only

full-noarith ~= reduction+solve cost; full-noload ~= load cost.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/dev_lk_pack_probe.py
"""

import functools
import time

import jax

jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobile_slam_tpu.ops import image as im
from mobile_slam_tpu.ops.lk_pallas import (
    _bilinear_block, _load_block, _pad_for_kernel, _scharr_on_block)

import os

K = int(os.environ.get("PROBE_K", "160"))
H = W = 512
WIN = 21
ITERS = int(os.environ.get("PROBE_ITERS", "8"))


def _kernel(pts_ref, prev_ref, next_ref, out_ref, *, mode, shape, pad):
    h, w = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    win = WIN
    half = (win - 1) // 2

    def one_point(k, _):
        tx = pts_ref[k, 0]
        ty = pts_ref[k, 1]
        if mode == "notmpl":
            # Template stage replaced by constants: isolates outer-loop
            # control overhead from template work.
            t_patch = jnp.full((win, win), 0.5, jnp.float32)
            g_x = jnp.full((win, win), 0.25, jnp.float32)
            g_y = jnp.full((win, win), 0.25, jnp.float32)
        else:
            tbx = jnp.clip(jnp.floor(tx).astype(jnp.int32) - half - 1 + pad,
                           0, wp - (win + 3))
            tby = jnp.clip(jnp.floor(ty).astype(jnp.int32) - half - 1 + pad,
                           0, hp - (win + 3))
            ftx = tx - jnp.floor(tx)
            fty = ty - jnp.floor(ty)
            tb = _load_block(prev_ref, tby, tbx, win + 3, win + 3, hp, wp)
            gxb, gyb = _scharr_on_block(tb, win + 1)
            t_patch = _bilinear_block(tb[1:win + 2, 1:win + 2], ftx, fty,
                                      win)
            g_x = _bilinear_block(gxb, ftx, fty, win)
            g_y = _bilinear_block(gyb, ftx, fty, win)

        gxx = jnp.sum(g_x * g_x)
        gxy = jnp.sum(g_x * g_y)
        gyy = jnp.sum(g_y * g_y)
        det = gxx * gyy - gxy * gxy
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

        def body(it, c):
            ix_, iy_ = c
            if mode == "empty":
                return ix_ + 1e-4, iy_ + 1e-4
            if mode == "noload":
                c_patch = _bilinear_block(
                    tb[1:win + 2, 1:win + 2],
                    ix_ - jnp.floor(ix_), iy_ - jnp.floor(iy_), win)
            else:
                nbx = jnp.clip(
                    jnp.floor(ix_).astype(jnp.int32) - half + pad,
                    0, wp - (win + 1))
                nby = jnp.clip(
                    jnp.floor(iy_).astype(jnp.int32) - half + pad,
                    0, hp - (win + 1))
                nb = _load_block(next_ref, nby, nbx, win + 1, win + 1,
                                 hp, wp)
                c_patch = _bilinear_block(nb, ix_ - jnp.floor(ix_),
                                          iy_ - jnp.floor(iy_), win)
            if mode == "noarith":
                return ix_ + c_patch[0, 0] * 1e-9, iy_ + 1e-4
            diff = c_patch - t_patch
            b1 = jnp.sum(diff * g_x)
            b2 = jnp.sum(diff * g_y)
            dx = -(gyy * b1 - gxy * b2) * inv_det
            dy = -(gxx * b2 - gxy * b1) * inv_det
            return ix_ + dx, iy_ + dy

        cx, cy = jax.lax.fori_loop(0, ITERS, body, (tx, ty))
        out_ref[k, 0] = cx
        out_ref[k, 1] = cy
        return 0

    jax.lax.fori_loop(0, K, one_point, 0)


REPS_IN_GRAPH = 20


def build(mode, shape, pad):
    kern = functools.partial(_kernel, mode=mode, shape=shape, pad=pad)

    def once(pts, prev_p, next_p):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((K, 2), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(pts, prev_p, next_p)

    @jax.jit
    def run(pts, prev_p, next_p):
        # Chain REPS_IN_GRAPH kernel calls through a data dependency so
        # the measurement is device-bound, not dispatch-bound.
        def body(_, p):
            out = once(p, prev_p, next_p)
            return p + (out - p) * 1e-6
        return jax.lax.fori_loop(0, REPS_IN_GRAPH, body, pts), once(
            pts, prev_p, next_p)

    return run


def main():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H + 8, W + 8)).astype(np.float32)
    img0 = im.box_filter(jnp.asarray(base[4:4 + H, 4:4 + W]), 5)
    img1 = im.box_filter(jnp.asarray(base[1:1 + H, 7:7 + W]), 5)
    half = (WIN - 1) // 2
    pad = half + 2
    prev_p = _pad_for_kernel(img0.astype(jnp.float32), pad)
    next_p = _pad_for_kernel(img1.astype(jnp.float32), pad)
    pts = jnp.asarray(rng.uniform(30, H - 30, (K, 2)).astype(np.float32))

    modes = ("full", "notmpl", "empty")
    runs = {m: build(m, (H, W), pad) for m in modes}
    for m in modes:
        chained, single = runs[m](pts, prev_p, next_p)
        jax.block_until_ready(chained)
        if m == "full":
            disp = np.asarray(single) - np.asarray(pts)
            med = np.median(disp, axis=0)
            print(f"[sanity] median displacement {med} (expect ~[-3, 3])")

    samples = {m: [] for m in modes}
    for _ in range(3):  # interleave passes so drift hits all modes equally
        for m in modes:
            t0 = time.perf_counter()
            chained, _ = runs[m](pts, prev_p, next_p)
            jax.block_until_ready(chained)
            samples[m].append(
                (time.perf_counter() - t0) / REPS_IN_GRAPH * 1e3)
    times = {m: min(samples[m]) for m in modes}
    for m in modes:
        print(f"{m:8s}: {times[m]:7.3f} ms/call  "
              f"(samples {['%.3f' % s for s in samples[m]]})")

    per_iter = lambda ms: ms / (K * ITERS) * 1e3
    print(f"\nper point-iteration (us):")
    print(f"  total                   : {per_iter(times['full']):6.3f}")
    print(f"  load (full-noload)      : "
          f"{per_iter(times['full'] - times['noload']):6.3f}")
    print(f"  solve+red (full-noarith): "
          f"{per_iter(times['full'] - times['noarith']):6.3f}")
    print(f"  loop+template (empty)   : {per_iter(times['empty']):6.3f}")


if __name__ == "__main__":
    main()
