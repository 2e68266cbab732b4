"""Pallas TPU kernel for pyramidal Lucas-Kanade tracking.

The XLA formulation in ops/lk.py expresses patch sampling as (K, win*win)
element gathers inside a 30-iteration fori_loop per pyramid level; TPU has
no vector gather, so XLA lowers those to serialized element loads —
measured 395 ms per 512x512 frame for K=192 (scripts/dev_stage_timing.py),
~92% of the image-path frame time once doubled by the forward-backward
pass. This kernel keeps every pyramid level resident in VMEM and replaces
gathers with block loads:

  * Mosaic only allows dynamic block offsets that are 8-aligned in the
    sublane dim and 128-aligned in the lane dim, so a patch block is
    fetched as a (40, 256) superblock at the aligned floor
    (pl.multiple_of), then aligned exactly with two dynamic pltpu.roll
    rotations and a static slice (_load_block; a one-hot-matmul lane
    select is kept as _load_block_matmul for toolchains where wide
    dynamic lane rotates miscompile),
  * bilinear interpolation = 4 statically-shifted (win, win) sub-blocks
    weighted by the scalar fractional part,
  * template Scharr gradients are computed on the template block itself —
    Scharr and bilinear shift are both linear & shift-invariant, so
    sample(scharr(img)) == scharr_on_block(sample-region) away from image
    borders,
  * the KLT normal equations are (win, win) vector reductions, the 2x2
    solve is scalar math, and each point early-exits its iteration loop on
    convergence (a scalar while_loop; OpenCV's TermCriteria::EPS).

Semantics match ops/lk.py (same iteration budget, eps, min-eig health
check) including at image borders: each level is replicate-padded by
half+2 px before entering the kernel, which reproduces ops/lk.py's
per-pixel border clamp for any window within the padding (the same trick
cv::buildOpticalFlowPyramid uses). Estimates that wander further than
the padding read an origin-clamped block and are culled by the final
inside check; see tests/test_lk_pallas.py.

Reference behavior: cv::calcOpticalFlowPyrLK as used by
/root/reference/src/frontend/feature_tracker.cpp:130-136.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mobile_slam_tpu.ops.lk import LKParams

_INTERPRET = False  # flipped by tests to run the kernel on CPU

_ROWS = 32  # fetched rows: block height (<= 24) + sublane remainder (< 8)


def _roll(x, shift, axis):
    # pltpu.roll lowers to tpu.dynamic_rotate; interpret mode lacks it.
    if _INTERPRET:
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


# Superblock fetch geometry for _load_block: 32 rows covers the largest
# requested block (win+3 = 24 rows) plus the 8-align remainder (<8, and
# exactly 8 at the clamped bottom edge); 256 lanes covers 24 cols at any
# 128-align remainder (<128, up to 232 at the clamped right edge).
# BOTH must be powers of two: pltpu.roll's dynamic rotate silently
# miscompiles on non-power-of-2 axis sizes (empirically: 40 rows returns
# wrong content with no error; 32 and 256 are bit-exact — probe in
# scripts/dev_lk_load_ab.py).
_FETCH_ROWS = 32
_FETCH_LANES = 256


def _load_block_matmul(ref, by, bx, rows, cols, h, w):
    """Legacy lane selection via one-hot MXU matmul (exact for any width).

    Kept as the fallback for toolchains where the dynamic lane rotate in
    _load_block miscompiles: flip USE_ROLL_LOADS below and every kernel
    routes through this path. Measured ~2x slower per block load than the
    roll path (the matmul is tiny and MXU-latency-bound, and building the
    (wpad, cols) one-hot costs more VPU work than two rolls)."""
    wpad = ref.shape[1]
    by8 = jnp.minimum(8 * (by // 8), h - _ROWS)
    sub = by - by8
    blk = ref[pl.ds(pl.multiple_of(by8, 8), _ROWS), :]
    blk = _roll(blk, -sub, axis=0)
    src = jax.lax.broadcasted_iota(jnp.int32, (wpad, cols), 0)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (wpad, cols), 1)
    sel = (src == bx + tgt).astype(blk.dtype)
    # precision=HIGHEST: the default bf16 MXU pass loses ~1e-3 even though
    # each output is exactly one input times 1.0; HIGHEST makes the
    # selection bit-exact (verified in tests/test_lk_pallas.py).
    blk = jax.lax.dot_general(
        blk, sel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return blk[:rows]


# The roll path is the default: exact (pure data movement, no arithmetic)
# and ~2x faster end-to-end LK than the matmul select. Set False to fall
# back to the matmul path on toolchains where a 256-lane dynamic rotate
# miscompiles (the >256-lane rotate does, which is what the matmul path
# was originally written around).
USE_ROLL_LOADS = True

# Points processed per loop iteration. Profiling on chip
# (scripts/dev_lk_pack_probe.py) shows the kernels are bound by
# per-loop-iteration scalar/branch overhead (~1 us/iteration), not by the
# loads or the patch arithmetic — an iteration body with the loads and
# VPU work stripped costs nearly the same as the full body. Packing P
# points per iteration as straight-line masked code therefore cuts the
# dominant cost ~Px: converged (or inactive / non-invertible) points keep
# recomputing but their state is `where`-masked, so results are
# BIT-IDENTICAL to the unpacked per-point while_loop (same op sequence on
# the same values for every live point). The group's while_loop runs
# until every point in the pack converges, which costs max-over-pack
# iterations instead of per-point counts — wasted lanes, but each wasted
# iteration is ~free next to the loop overhead it amortizes.
PACK_POINTS = 4


def _ceil_to(n, m):
    return -(-n // m) * m


def _load_block(ref, by, bx, rows, cols, h, w):
    """(rows, cols) block of ref at dynamic origin (by, bx).

    by must be pre-clamped to [0, h - rows] and bx to [0, w - cols] in
    LOGICAL padded coordinates (h, w = replicate-padded extents; ref may
    carry extra zero padding beyond them for alignment).

    Mosaic only allows dynamic block offsets it can prove 8-aligned in the
    sublane dim and 128-aligned in the lane dim, so: fetch a
    (_FETCH_ROWS, _FETCH_LANES) superblock at the aligned floor, rotate the
    remainders away with two dynamic pltpu.rolls (exact ONLY on power-of-2
    axis sizes — see the _FETCH_ROWS comment), and take a static slice.
    Requires ref rows % 8 == 0, ref lanes % 128 == 0 and >= 256 —
    _pad_for_kernel guarantees both."""
    if not USE_ROLL_LOADS:
        return _load_block_matmul(ref, by, bx, rows, cols, h, w)
    hp, wpad = ref.shape
    by8 = jnp.minimum(8 * (by // 8), hp - _FETCH_ROWS)
    obx = jnp.minimum(128 * (bx // 128), wpad - _FETCH_LANES)
    blk = ref[pl.ds(pl.multiple_of(by8, 8), _FETCH_ROWS),
              pl.ds(pl.multiple_of(obx, 128), _FETCH_LANES)]
    blk = _roll(blk, -(by - by8), axis=0)
    blk = _roll(blk, -(bx - obx), axis=1)
    return blk[:rows, :cols]


def _pad_for_kernel(p, pad):
    """Replicate-pad by `pad` (== ops/lk.py's per-pixel border clamp for
    any window within `pad`; cv::buildOpticalFlowPyramid does the same),
    then zero-pad to the _load_block alignment contract: rows to a
    multiple of 8, lanes to a multiple of 128 with a 256 minimum. The
    zero lanes/rows are never read (all block origins are clamped to the
    replicate-padded extents before the aligned fetch)."""
    p = jnp.pad(p, pad, mode="edge")
    hp, wp = p.shape
    ht = max(_FETCH_ROWS, -(-hp // 8) * 8)
    wt = max(_FETCH_LANES, -(-wp // 128) * 128)
    if (ht, wt) != (hp, wp):
        p = jnp.pad(p, ((0, ht - hp), (0, wt - wp)))
    return p


def _bilinear_block(block, fx, fy, win):
    """(win, win) bilinear patch from a block whose [0:win+1, 0:win+1]
    region covers the patch support; fx/fy are scalar fractions."""
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    return (w00 * block[0:win, 0:win]
            + w01 * block[0:win, 1:win + 1]
            + w10 * block[1:win + 1, 0:win]
            + w11 * block[1:win + 1, 1:win + 1])


def _scharr_on_block(tb, n):
    """Scharr x/y derivatives of the interior (n, n) region of an
    (n+2, n+2) block (image.scharr_derivatives semantics, /32 scale)."""
    right = (3.0 * tb[0:n, 2:n + 2] + 10.0 * tb[1:n + 1, 2:n + 2]
             + 3.0 * tb[2:n + 2, 2:n + 2])
    left = (3.0 * tb[0:n, 0:n] + 10.0 * tb[1:n + 1, 0:n]
            + 3.0 * tb[2:n + 2, 0:n])
    bot = (3.0 * tb[2:n + 2, 0:n] + 10.0 * tb[2:n + 2, 1:n + 1]
           + 3.0 * tb[2:n + 2, 2:n + 2])
    top = (3.0 * tb[0:n, 0:n] + 10.0 * tb[0:n, 1:n + 1]
           + 3.0 * tb[0:n, 2:n + 2])
    return (right - left) / 32.0, (bot - top) / 32.0


def _lk_kernel(pts_ref, active_ref, *refs, params: LKParams, shapes,
               pad, out_x_ref, out_y_ref, out_ok_ref):
    """One program: fori over the K point slots, unrolled over levels.
    shapes are LOGICAL level shapes; every image ref is replicate-padded
    by `pad` on all four sides (plus zero lane padding to >= 128)."""
    n_lvl = len(shapes)
    prev_refs = refs[:n_lvl]
    next_refs = refs[n_lvl:]
    win = params.window
    half = (win - 1) // 2
    win2 = float(win * win)
    eps2 = params.eps * params.eps
    k_slots = out_x_ref.shape[0]

    def one_point(k, _):
        px = pts_ref[k, 0]
        py = pts_ref[k, 1]
        is_active = active_ref[k] != 0

        @pl.when(jnp.logical_not(is_active))
        def _():
            out_x_ref[k, 0] = px
            out_y_ref[k, 0] = py
            out_ok_ref[k, 0] = 0

        @pl.when(is_active)
        def _():
            top_scale = jnp.float32(2.0 ** (n_lvl - 1))
            carry = (px / top_scale, py / top_scale, jnp.asarray(True))
            for lvl in range(n_lvl - 1, -1, -1):
                h, w = shapes[lvl]
                hp, wp = h + 2 * pad, w + 2 * pad
                scale = jnp.float32(2.0 ** lvl)
                tx = px / scale
                ty = py / scale

                # Template block: (win+3, win+3) so Scharr's 1-px apron
                # and bilinear's +1 both fit; origin in PADDED coords.
                tbx = jnp.clip(
                    jnp.floor(tx).astype(jnp.int32) - half - 1 + pad,
                    0, wp - (win + 3))
                tby = jnp.clip(
                    jnp.floor(ty).astype(jnp.int32) - half - 1 + pad,
                    0, hp - (win + 3))
                ftx = tx - jnp.floor(tx)
                fty = ty - jnp.floor(ty)
                tb = _load_block(prev_refs[lvl], tby, tbx,
                                 win + 3, win + 3, hp, wp)
                gxb, gyb = _scharr_on_block(tb, win + 1)  # (win+1, win+1)
                t_patch = _bilinear_block(tb[1:win + 2, 1:win + 2],
                                          ftx, fty, win)
                g_x = _bilinear_block(gxb, ftx, fty, win)
                g_y = _bilinear_block(gyb, ftx, fty, win)

                gxx = jnp.sum(g_x * g_x)
                gxy = jnp.sum(g_x * g_y)
                gyy = jnp.sum(g_y * g_y)
                det = gxx * gyy - gxy * gxy
                tr = gxx + gyy
                min_eig = 0.5 * (tr - jnp.sqrt(
                    jnp.maximum(tr * tr - 4.0 * det, 0.0))) / win2
                invertible = min_eig > params.min_eig_threshold
                inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

                cx, cy, ok_in = carry

                def cond(c):
                    it, _, _, conv = c
                    return (it < params.iters) & jnp.logical_not(conv)

                def iter_body(c):
                    it, ix_, iy_, conv = c
                    nbx = jnp.clip(
                        jnp.floor(ix_).astype(jnp.int32) - half + pad,
                        0, wp - (win + 1))
                    nby = jnp.clip(
                        jnp.floor(iy_).astype(jnp.int32) - half + pad,
                        0, hp - (win + 1))
                    nb = _load_block(next_refs[lvl], nby, nbx,
                                     win + 1, win + 1, hp, wp)
                    c_patch = _bilinear_block(nb, ix_ - jnp.floor(ix_),
                                              iy_ - jnp.floor(iy_), win)
                    diff = c_patch - t_patch
                    b1 = jnp.sum(diff * g_x)
                    b2 = jnp.sum(diff * g_y)
                    dx = -(gyy * b1 - gxy * b2) * inv_det
                    dy = -(gxx * b2 - gxy * b1) * inv_det
                    conv = dx * dx + dy * dy <= eps2
                    return it + 1, ix_ + dx, iy_ + dy, conv

                cx, cy = jax.lax.cond(
                    invertible,
                    lambda a, b: jax.lax.while_loop(
                        cond, iter_body,
                        (jnp.int32(0), a, b, jnp.asarray(False)))[1:3],
                    lambda a, b: (a, b),
                    cx, cy)
                # Per-LEVEL health gate, like ops/lk.py's track_level: a
                # point that leaves the (logical) image at ANY level is
                # dead even if a finer level pulls it back in — such
                # tracks are garbage, and because the failure mode is
                # symmetric they can survive the forward-backward check
                # and poison the estimator.
                inside_l = ((cx >= 0.0) & (cx < w - 1.0)
                            & (cy >= 0.0) & (cy < h - 1.0))
                finite_l = jnp.isfinite(cx) & jnp.isfinite(cy)
                ok_in = ok_in & invertible & inside_l & finite_l
                if lvl > 0:
                    cx = cx * 2.0
                    cy = cy * 2.0
                carry = (cx, cy, ok_in)

            cx, cy, ok_in = carry
            out_x_ref[k, 0] = cx
            out_y_ref[k, 0] = cy
            out_ok_ref[k, 0] = ok_in.astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, k_slots, one_point, 0)


def _lk_kernel_packed(pts_ref, active_ref, *refs, params: LKParams,
                      shapes, pad, n_pack, out_x_ref, out_y_ref,
                      out_ok_ref):
    """_lk_kernel with n_pack points per loop iteration (PACK_POINTS).

    Straight-line masked code: every point in the pack recomputes each
    iteration, but converged / inactive / non-invertible points are
    `where`-masked so their state never moves — results are bit-identical
    to the unpacked kernel. k_slots must be a multiple of n_pack (the
    wrapper pads with inactive slots)."""
    n_lvl = len(shapes)
    prev_refs = refs[:n_lvl]
    next_refs = refs[n_lvl:]
    win = params.window
    half = (win - 1) // 2
    win2 = float(win * win)
    eps2 = params.eps * params.eps
    k_slots = out_x_ref.shape[0]
    P = n_pack

    def one_group(g, _):
        k0 = g * P
        px = [pts_ref[k0 + p, 0] for p in range(P)]
        py = [pts_ref[k0 + p, 1] for p in range(P)]
        act = [active_ref[k0 + p] != 0 for p in range(P)]

        top_scale = jnp.float32(2.0 ** (n_lvl - 1))
        cx = [px[p] / top_scale for p in range(P)]
        cy = [py[p] / top_scale for p in range(P)]
        ok_in = [jnp.asarray(True) for _ in range(P)]

        for lvl in range(n_lvl - 1, -1, -1):
            h, w = shapes[lvl]
            hp, wp = h + 2 * pad, w + 2 * pad
            scale = jnp.float32(2.0 ** lvl)

            t_patch, g_x, g_y = [], [], []
            gxx, gxy, gyy, inv_det, invertible = [], [], [], [], []
            for p in range(P):
                tx = px[p] / scale
                ty = py[p] / scale
                tbx = jnp.clip(
                    jnp.floor(tx).astype(jnp.int32) - half - 1 + pad,
                    0, wp - (win + 3))
                tby = jnp.clip(
                    jnp.floor(ty).astype(jnp.int32) - half - 1 + pad,
                    0, hp - (win + 3))
                ftx = tx - jnp.floor(tx)
                fty = ty - jnp.floor(ty)
                tb = _load_block(prev_refs[lvl], tby, tbx,
                                 win + 3, win + 3, hp, wp)
                gxb, gyb = _scharr_on_block(tb, win + 1)
                t_patch.append(_bilinear_block(tb[1:win + 2, 1:win + 2],
                                               ftx, fty, win))
                g_x.append(_bilinear_block(gxb, ftx, fty, win))
                g_y.append(_bilinear_block(gyb, ftx, fty, win))

                a = jnp.sum(g_x[p] * g_x[p])
                b = jnp.sum(g_x[p] * g_y[p])
                c = jnp.sum(g_y[p] * g_y[p])
                det = a * c - b * b
                tr = a + c
                min_eig = 0.5 * (tr - jnp.sqrt(
                    jnp.maximum(tr * tr - 4.0 * det, 0.0))) / win2
                gxx.append(a)
                gxy.append(b)
                gyy.append(c)
                invertible.append(min_eig > params.min_eig_threshold)
                inv_det.append(jnp.where(jnp.abs(det) > 1e-12,
                                         1.0 / det, 0.0))

            def cond(c):
                it, _, _, convs = c
                all_done = convs[0]
                for p in range(1, P):
                    all_done = all_done & convs[p]
                return (it < params.iters) & jnp.logical_not(all_done)

            def iter_body(c):
                it, xs, ys, convs = c
                nxs, nys, ncvs = [], [], []
                for p in range(P):
                    x_, y_, cv = xs[p], ys[p], convs[p]
                    nbx = jnp.clip(
                        jnp.floor(x_).astype(jnp.int32) - half + pad,
                        0, wp - (win + 1))
                    nby = jnp.clip(
                        jnp.floor(y_).astype(jnp.int32) - half + pad,
                        0, hp - (win + 1))
                    nb = _load_block(next_refs[lvl], nby, nbx,
                                     win + 1, win + 1, hp, wp)
                    c_patch = _bilinear_block(nb, x_ - jnp.floor(x_),
                                              y_ - jnp.floor(y_), win)
                    diff = c_patch - t_patch[p]
                    b1 = jnp.sum(diff * g_x[p])
                    b2 = jnp.sum(diff * g_y[p])
                    dx = -(gyy[p] * b1 - gxy[p] * b2) * inv_det[p]
                    dy = -(gxx[p] * b2 - gxy[p] * b1) * inv_det[p]
                    step_conv = dx * dx + dy * dy <= eps2
                    nxs.append(jnp.where(cv, x_, x_ + dx))
                    nys.append(jnp.where(cv, y_, y_ + dy))
                    ncvs.append(cv | step_conv)
                return it + 1, tuple(nxs), tuple(nys), tuple(ncvs)

            conv0 = tuple(
                jnp.logical_not(act[p] & invertible[p]) for p in range(P))
            _, xs, ys, _ = jax.lax.while_loop(
                cond, iter_body,
                (jnp.int32(0), tuple(cx), tuple(cy), conv0))
            cx = list(xs)
            cy = list(ys)

            for p in range(P):
                # Per-LEVEL health gate — see _lk_kernel.
                inside_l = ((cx[p] >= 0.0) & (cx[p] < w - 1.0)
                            & (cy[p] >= 0.0) & (cy[p] < h - 1.0))
                finite_l = jnp.isfinite(cx[p]) & jnp.isfinite(cy[p])
                ok_in[p] = (ok_in[p] & invertible[p] & inside_l
                            & finite_l)
                if lvl > 0:
                    cx[p] = cx[p] * 2.0
                    cy[p] = cy[p] * 2.0

        for p in range(P):
            out_x_ref[k0 + p, 0] = jnp.where(act[p], cx[p], px[p])
            out_y_ref[k0 + p, 0] = jnp.where(act[p], cy[p], py[p])
            out_ok_ref[k0 + p, 0] = (act[p] & ok_in[p]).astype(jnp.int32)

        return 0

    jax.lax.fori_loop(0, k_slots // P, one_group, 0)


def _track_pyramidal(prev_pyr, next_pyr, prev_pts, active,
                     params: LKParams, n_pack: int | None = None):
    """Drop-in for ops.lk.track_pyramidal on TPU. prev_pyr/next_pyr are
    (H/2^l, W/2^l) float32 images; prev_pts (K, 2); active (K,).

    n_pack overrides the module-default PACK_POINTS (ILP packing factor);
    pass it explicitly when A/B-ing pack modes so correctness never depends
    on re-tracing after a global mutation."""
    k_slots = prev_pts.shape[0]
    shapes = tuple(im.shape for im in prev_pyr)
    f32 = jnp.float32

    half = (params.window - 1) // 2
    pad = half + 2  # covers the window + bilinear +1 + Scharr apron

    prev_pyr = [_pad_for_kernel(p, pad) for p in prev_pyr]
    next_pyr = [_pad_for_kernel(p, pad) for p in next_pyr]

    n_pack = max(1, int(PACK_POINTS if n_pack is None else n_pack))
    kp = _ceil_to(k_slots, n_pack)
    pts_in = prev_pts.astype(f32)
    act_in = active.astype(jnp.int32)
    if kp != k_slots:
        pts_in = jnp.pad(pts_in, ((0, kp - k_slots), (0, 0)))
        act_in = jnp.pad(act_in, (0, kp - k_slots))

    if n_pack > 1:
        kernel = functools.partial(_lk_kernel_packed, params=params,
                                   shapes=shapes, pad=pad, n_pack=n_pack)
    else:
        kernel = functools.partial(_lk_kernel, params=params,
                                   shapes=shapes, pad=pad)

    def wrapped(pts_ref, active_ref, *rest):
        *imgs, ox, oy, ook = rest
        kernel(pts_ref, active_ref, *imgs,
               out_x_ref=ox, out_y_ref=oy, out_ok_ref=ook)

    out_x, out_y, out_ok = pl.pallas_call(
        wrapped,
        out_shape=(
            jax.ShapeDtypeStruct((kp, 1), f32),
            jax.ShapeDtypeStruct((kp, 1), f32),
            jax.ShapeDtypeStruct((kp, 1), jnp.int32),
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * len(prev_pyr))
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
    )(pts_in, act_in,
      *[p.astype(f32) for p in prev_pyr],
      *[p.astype(f32) for p in next_pyr])

    pos = jnp.concatenate([out_x[:k_slots], out_y[:k_slots]], axis=1)
    return pos, out_ok[:k_slots, 0] != 0


def _refine_kernel(pts_ref, active_ref, img_ref, t_ref, gx_ref, gy_ref,
                   out_x_ref, out_y_ref, out_ok_ref, out_res_ref, *,
                   window, iters, eps, max_shift, shape, pad):
    """Anchor-template refinement (ops.lk.refine_template) as a kernel:
    explicit (K, win, win) templates, zero-mean matching, excursion clamp.
    img_ref is replicate-padded by `pad`; shape is the LOGICAL shape."""
    h, w = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    win = window
    half = (win - 1) // 2
    win2 = float(win * win)
    eps2 = eps * eps
    k_slots = out_x_ref.shape[0]

    def one_point(k, _):
        x0 = pts_ref[k, 0]
        y0 = pts_ref[k, 1]
        is_active = active_ref[k] != 0

        @pl.when(jnp.logical_not(is_active))
        def _():
            out_x_ref[k, 0] = x0
            out_y_ref[k, 0] = y0
            out_ok_ref[k, 0] = 0
            out_res_ref[k, 0] = 0.0

        @pl.when(is_active)
        def _():
            t_patch = t_ref[k]
            g_x = gx_ref[k]
            g_y = gy_ref[k]
            t_zm = t_patch - jnp.sum(t_patch) / win2

            gxx = jnp.sum(g_x * g_x)
            gxy = jnp.sum(g_x * g_y)
            gyy = jnp.sum(g_y * g_y)
            det = gxx * gyy - gxy * gxy
            tr = gxx + gyy
            min_eig = 0.5 * (tr - jnp.sqrt(
                jnp.maximum(tr * tr - 4.0 * det, 0.0))) / win2
            invertible = min_eig > 1e-4
            inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

            def sample(ix_, iy_):
                bx = jnp.clip(jnp.floor(ix_).astype(jnp.int32) - half + pad,
                              0, wp - (win + 1))
                by = jnp.clip(jnp.floor(iy_).astype(jnp.int32) - half + pad,
                              0, hp - (win + 1))
                nb = _load_block(img_ref, by, bx, win + 1, win + 1, hp, wp)
                return _bilinear_block(nb, ix_ - jnp.floor(ix_),
                                      iy_ - jnp.floor(iy_), win)

            def cond(c):
                it, _, _, conv = c
                return (it < iters) & jnp.logical_not(conv)

            def iter_body(c):
                it, ix_, iy_, conv = c
                c_patch = sample(ix_, iy_)
                c_zm = c_patch - jnp.sum(c_patch) / win2
                diff = c_zm - t_zm
                b1 = jnp.sum(diff * g_x)
                b2 = jnp.sum(diff * g_y)
                dx = -(gyy * b1 - gxy * b2) * inv_det
                dy = -(gxx * b2 - gxy * b1) * inv_det
                nx, ny = ix_ + dx, iy_ + dy
                # Clamp total excursion from the starting estimate.
                ox_, oy_ = nx - x0, ny - y0
                r = jnp.sqrt(ox_ * ox_ + oy_ * oy_)
                s = jnp.where(r > max_shift,
                              max_shift / jnp.maximum(r, 1e-9), 1.0)
                conv = dx * dx + dy * dy <= eps2
                return it + 1, x0 + ox_ * s, y0 + oy_ * s, conv

            cx, cy = jax.lax.cond(
                invertible,
                lambda a, b: jax.lax.while_loop(
                    cond, iter_body,
                    (jnp.int32(0), a, b, jnp.asarray(False)))[1:3],
                lambda a, b: (a, b),
                x0, y0)

            c_patch = sample(cx, cy)
            c_zm = c_patch - jnp.sum(c_patch) / win2
            resid = jnp.sum(jnp.abs(c_zm - t_zm)) / win2
            inside = ((cx >= 0.0) & (cx < w - 1.0)
                      & (cy >= 0.0) & (cy < h - 1.0))
            finite = jnp.isfinite(cx) & jnp.isfinite(cy)
            out_x_ref[k, 0] = cx
            out_y_ref[k, 0] = cy
            out_ok_ref[k, 0] = (invertible & inside
                                & finite).astype(jnp.int32)
            out_res_ref[k, 0] = resid

        return 0

    jax.lax.fori_loop(0, k_slots, one_point, 0)


def _refine_kernel_packed(pts_ref, active_ref, img_ref, t_ref, gx_ref,
                          gy_ref, out_x_ref, out_y_ref, out_ok_ref,
                          out_res_ref, *, window, iters, eps, max_shift,
                          shape, pad, n_pack):
    """_refine_kernel with n_pack points per loop iteration — see
    _lk_kernel_packed for the masking scheme (bit-identical results)."""
    h, w = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    win = window
    half = (win - 1) // 2
    win2 = float(win * win)
    eps2 = eps * eps
    k_slots = out_x_ref.shape[0]
    P = n_pack

    def sample(ix_, iy_):
        bx = jnp.clip(jnp.floor(ix_).astype(jnp.int32) - half + pad,
                      0, wp - (win + 1))
        by = jnp.clip(jnp.floor(iy_).astype(jnp.int32) - half + pad,
                      0, hp - (win + 1))
        nb = _load_block(img_ref, by, bx, win + 1, win + 1, hp, wp)
        return _bilinear_block(nb, ix_ - jnp.floor(ix_),
                               iy_ - jnp.floor(iy_), win)

    def one_group(g, _):
        k0 = g * P
        x0 = [pts_ref[k0 + p, 0] for p in range(P)]
        y0 = [pts_ref[k0 + p, 1] for p in range(P)]
        act = [active_ref[k0 + p] != 0 for p in range(P)]

        t_zm, g_x, g_y = [], [], []
        gxx, gxy, gyy, inv_det, invertible = [], [], [], [], []
        for p in range(P):
            tp = t_ref[k0 + p]
            gx_p = gx_ref[k0 + p]
            gy_p = gy_ref[k0 + p]
            t_zm.append(tp - jnp.sum(tp) / win2)
            g_x.append(gx_p)
            g_y.append(gy_p)
            a = jnp.sum(gx_p * gx_p)
            b = jnp.sum(gx_p * gy_p)
            c = jnp.sum(gy_p * gy_p)
            det = a * c - b * b
            tr = a + c
            min_eig = 0.5 * (tr - jnp.sqrt(
                jnp.maximum(tr * tr - 4.0 * det, 0.0))) / win2
            gxx.append(a)
            gxy.append(b)
            gyy.append(c)
            invertible.append(min_eig > 1e-4)
            inv_det.append(jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0))

        def cond(c):
            it, _, _, convs = c
            all_done = convs[0]
            for p in range(1, P):
                all_done = all_done & convs[p]
            return (it < iters) & jnp.logical_not(all_done)

        def iter_body(c):
            it, xs, ys, convs = c
            nxs, nys, ncvs = [], [], []
            for p in range(P):
                x_, y_, cv = xs[p], ys[p], convs[p]
                c_patch = sample(x_, y_)
                c_zm = c_patch - jnp.sum(c_patch) / win2
                diff = c_zm - t_zm[p]
                b1 = jnp.sum(diff * g_x[p])
                b2 = jnp.sum(diff * g_y[p])
                dx = -(gyy[p] * b1 - gxy[p] * b2) * inv_det[p]
                dy = -(gxx[p] * b2 - gxy[p] * b1) * inv_det[p]
                nx, ny = x_ + dx, y_ + dy
                ox_, oy_ = nx - x0[p], ny - y0[p]
                r = jnp.sqrt(ox_ * ox_ + oy_ * oy_)
                s = jnp.where(r > max_shift,
                              max_shift / jnp.maximum(r, 1e-9), 1.0)
                step_conv = dx * dx + dy * dy <= eps2
                nxs.append(jnp.where(cv, x_, x0[p] + ox_ * s))
                nys.append(jnp.where(cv, y_, y0[p] + oy_ * s))
                ncvs.append(cv | step_conv)
            return it + 1, tuple(nxs), tuple(nys), tuple(ncvs)

        conv0 = tuple(
            jnp.logical_not(act[p] & invertible[p]) for p in range(P))
        _, xs, ys, _ = jax.lax.while_loop(
            cond, iter_body,
            (jnp.int32(0), tuple(x0), tuple(y0), conv0))

        for p in range(P):
            cx, cy = xs[p], ys[p]
            c_patch = sample(cx, cy)
            c_zm = c_patch - jnp.sum(c_patch) / win2
            resid = jnp.sum(jnp.abs(c_zm - t_zm[p])) / win2
            inside = ((cx >= 0.0) & (cx < w - 1.0)
                      & (cy >= 0.0) & (cy < h - 1.0))
            finite = jnp.isfinite(cx) & jnp.isfinite(cy)
            out_x_ref[k0 + p, 0] = jnp.where(act[p], cx, x0[p])
            out_y_ref[k0 + p, 0] = jnp.where(act[p], cy, y0[p])
            out_ok_ref[k0 + p, 0] = (act[p] & invertible[p] & inside
                                     & finite).astype(jnp.int32)
            out_res_ref[k0 + p, 0] = jnp.where(act[p], resid, 0.0)

        return 0

    jax.lax.fori_loop(0, k_slots // P, one_group, 0)


def _refine_template(img, t_patch, gx, gy, pos0, active, window, iters,
                     eps, max_shift, n_pack: int | None = None):
    """Drop-in for ops.lk.refine_template on TPU. t_patch/gx/gy are
    (K, window*window) as stored in TrackerState. n_pack overrides
    PACK_POINTS (see _track_pyramidal)."""
    k_slots = pos0.shape[0]
    f32 = jnp.float32
    t3 = t_patch.reshape(k_slots, window, window).astype(f32)
    gx3 = gx.reshape(k_slots, window, window).astype(f32)
    gy3 = gy.reshape(k_slots, window, window).astype(f32)

    n_pack = max(1, int(PACK_POINTS if n_pack is None else n_pack))
    kp = _ceil_to(k_slots, n_pack)
    pts_in = pos0.astype(f32)
    act_in = active.astype(jnp.int32)
    if kp != k_slots:
        dk = kp - k_slots
        pts_in = jnp.pad(pts_in, ((0, dk), (0, 0)))
        act_in = jnp.pad(act_in, (0, dk))
        t3 = jnp.pad(t3, ((0, dk), (0, 0), (0, 0)))
        gx3 = jnp.pad(gx3, ((0, dk), (0, 0), (0, 0)))
        gy3 = jnp.pad(gy3, ((0, dk), (0, 0), (0, 0)))

    half = (window - 1) // 2
    pad = half + 2
    if n_pack > 1:
        kernel = functools.partial(
            _refine_kernel_packed, window=window, iters=iters,
            eps=float(eps), max_shift=float(max_shift), shape=img.shape,
            pad=pad, n_pack=n_pack)
    else:
        kernel = functools.partial(
            _refine_kernel, window=window, iters=iters, eps=float(eps),
            max_shift=float(max_shift), shape=img.shape, pad=pad)

    def wrapped(pts_ref, active_ref, img_ref, t_ref, gx_ref, gy_ref,
                ox, oy, ook, ores):
        kernel(pts_ref, active_ref, img_ref, t_ref, gx_ref, gy_ref,
               out_x_ref=ox, out_y_ref=oy, out_ok_ref=ook,
               out_res_ref=ores)

    out_x, out_y, out_ok, out_res = pl.pallas_call(
        wrapped,
        out_shape=(
            jax.ShapeDtypeStruct((kp, 1), f32),
            jax.ShapeDtypeStruct((kp, 1), f32),
            jax.ShapeDtypeStruct((kp, 1), jnp.int32),
            jax.ShapeDtypeStruct((kp, 1), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        interpret=_INTERPRET,
    )(pts_in, act_in, _pad_for_kernel(img.astype(f32), pad), t3, gx3, gy3)

    pos = jnp.concatenate([out_x[:k_slots], out_y[:k_slots]], axis=1)
    return pos, out_ok[:k_slots, 0] != 0, out_res[:k_slots, 0]


def _extract_kernel(pts_ref, img_ref, t_ref, gx_ref, gy_ref, *,
                    window, shape, pad):
    """Template + Scharr gradient patch extraction (ops.lk.extract_patches)
    for every slot: one block load + block Scharr + bilinear per point.
    img_ref is replicate-padded by `pad`; shape is the LOGICAL shape."""
    h, w = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    win = window
    half = (win - 1) // 2
    k_slots = pts_ref.shape[0]

    def one_point(k, _):
        tx = pts_ref[k, 0]
        ty = pts_ref[k, 1]
        tbx = jnp.clip(jnp.floor(tx).astype(jnp.int32) - half - 1 + pad,
                       0, wp - (win + 3))
        tby = jnp.clip(jnp.floor(ty).astype(jnp.int32) - half - 1 + pad,
                       0, hp - (win + 3))
        ftx = tx - jnp.floor(tx)
        fty = ty - jnp.floor(ty)
        tb = _load_block(img_ref, tby, tbx, win + 3, win + 3, hp, wp)
        gxb, gyb = _scharr_on_block(tb, win + 1)
        t_ref[k] = _bilinear_block(tb[1:win + 2, 1:win + 2], ftx, fty, win)
        gx_ref[k] = _bilinear_block(gxb, ftx, fty, win)
        gy_ref[k] = _bilinear_block(gyb, ftx, fty, win)
        return 0

    jax.lax.fori_loop(0, k_slots, one_point, 0)


def _extract_kernel_packed(pts_ref, img_ref, t_ref, gx_ref, gy_ref, *,
                           window, shape, pad, n_pack):
    """_extract_kernel with n_pack points per loop iteration."""
    h, w = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    win = window
    half = (win - 1) // 2
    k_slots = pts_ref.shape[0]
    P = n_pack

    def one_group(g, _):
        k0 = g * P
        for p in range(P):
            tx = pts_ref[k0 + p, 0]
            ty = pts_ref[k0 + p, 1]
            tbx = jnp.clip(
                jnp.floor(tx).astype(jnp.int32) - half - 1 + pad,
                0, wp - (win + 3))
            tby = jnp.clip(
                jnp.floor(ty).astype(jnp.int32) - half - 1 + pad,
                0, hp - (win + 3))
            ftx = tx - jnp.floor(tx)
            fty = ty - jnp.floor(ty)
            tb = _load_block(img_ref, tby, tbx, win + 3, win + 3, hp, wp)
            gxb, gyb = _scharr_on_block(tb, win + 1)
            t_ref[k0 + p] = _bilinear_block(tb[1:win + 2, 1:win + 2],
                                            ftx, fty, win)
            gx_ref[k0 + p] = _bilinear_block(gxb, ftx, fty, win)
            gy_ref[k0 + p] = _bilinear_block(gyb, ftx, fty, win)
        return 0

    jax.lax.fori_loop(0, k_slots // P, one_group, 0)


def _extract_patches(img, centers, window, n_pack: int | None = None):
    """Drop-in for ops.lk.extract_patches on TPU: (t, gx, gy) each
    (K, window*window). Border behavior: replicate padding (== per-pixel
    clamp); ops/lk.py's full-image Scharr uses reflect-101 padding, so
    gradient patches of windows overlapping the border differ in their
    outermost pixel — such features are border-culled by the tracker."""
    k_slots = centers.shape[0]
    f32 = jnp.float32
    half = (window - 1) // 2
    pad = half + 2

    n_pack = max(1, int(PACK_POINTS if n_pack is None else n_pack))
    kp = _ceil_to(k_slots, n_pack)
    pts_in = centers.astype(f32)
    if kp != k_slots:
        pts_in = jnp.pad(pts_in, ((0, kp - k_slots), (0, 0)))

    if n_pack > 1:
        kernel = functools.partial(_extract_kernel_packed, window=window,
                                   shape=img.shape, pad=pad,
                                   n_pack=n_pack)
    else:
        kernel = functools.partial(_extract_kernel, window=window,
                                   shape=img.shape, pad=pad)

    def wrapped(pts_ref, img_ref, t_ref, gx_ref, gy_ref):
        kernel(pts_ref, img_ref, t_ref, gx_ref, gy_ref)

    t3, gx3, gy3 = pl.pallas_call(
        wrapped,
        out_shape=(
            jax.ShapeDtypeStruct((kp, window, window), f32),
            jax.ShapeDtypeStruct((kp, window, window), f32),
            jax.ShapeDtypeStruct((kp, window, window), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=_INTERPRET,
    )(pts_in, _pad_for_kernel(img.astype(f32), pad))

    return (t3[:k_slots].reshape(k_slots, window * window),
            gx3[:k_slots].reshape(k_slots, window * window),
            gy3[:k_slots].reshape(k_slots, window * window))


def _sequential_vmap(fn, n_array_args):
    """Make `fn` vmappable by falling back to a sequential lax.map.

    The kernels here hold whole pyramid levels in VMEM and pass per-point
    coordinates through SMEM scalar blocks; Mosaic cannot auto-batch either
    (vmap adds a grid dim whose SMEM block shapes violate the (8, 128)
    alignment rule). Multi-sequence fleet mode (parallel/batch.py) vmaps the
    full image pipeline, so these entry points batch by running the kernel
    once per sequence inside lax.map — the rest of the pipeline still
    batches natively, and kernels on one core are serialized anyway.

    Array arguments (possibly pytrees) must come first; the remaining
    `len(args) - n_array_args` are static Python values.
    """

    def wrapper(*args):
        arr_args = args[:n_array_args]
        static = args[n_array_args:]

        @jax.custom_batching.custom_vmap
        def impl(*a):
            return fn(*a, *static)

        @impl.def_vmap
        def _rule(axis_size, in_batched, *a):  # noqa: ANN001
            a_b = jax.tree.map(
                lambda x, b: x if b else jnp.broadcast_to(
                    x, (axis_size,) + x.shape),
                tuple(a), tuple(in_batched),
            )
            out = jax.lax.map(lambda xs: fn(*xs, *static), a_b)
            out_batched = jax.tree.map(lambda _: True, out)
            return out, out_batched

        return impl(*arr_args)

    wrapper.__doc__ = fn.__doc__
    return wrapper


track_pyramidal = _sequential_vmap(_track_pyramidal, 4)
refine_template = _sequential_vmap(_refine_template, 6)
extract_patches = _sequential_vmap(_extract_patches, 2)
