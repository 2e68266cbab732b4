"""Pyramidal Lucas-Kanade optical flow (TPU-native, all points in parallel).

Replaces cv::calcOpticalFlowPyrLK as used by the reference tracker
(src/frontend/feature_tracker.cpp:130-136): coarse-to-fine over a Gaussian
pyramid, per-level iterative KLT with a 21x21 window, Scharr template
gradients, fixed iteration budget with epsilon-based convergence masking,
and OpenCV's min-eigenvalue health check.

Instead of per-point C loops, each level processes the full fixed-size point
bank as batched (K, win, win) bilinear gathers + reductions — one XLA
program for any number of live points (dead slots are masked).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mobile_slam_tpu.ops import image as im


class LKParams(NamedTuple):
    window: int = 21          # lk_window_size (config.h:44)
    levels: int = 3           # lk_pyramid_levels
    iters: int = 30           # lk_iterations
    eps: float = 0.01         # lk_eps
    min_eig_threshold: float = 1e-4  # OpenCV minEigThreshold


def _window_offsets(window: int, dtype):
    r = (window - 1) / 2.0
    o = jnp.arange(window, dtype=dtype) - r
    ox, oy = jnp.meshgrid(o, o)
    return jnp.stack([ox, oy], axis=-1).reshape(-1, 2)  # (win*win, 2)


def _patch(img, centers, offsets):
    """Bilinear patches around centers: (K, 2) x (P, 2) -> (K, P)."""
    coords = centers[:, None, :] + offsets[None, :, :]
    return im.bilinear_sample(img, coords)


def track_level(prev_img, next_img, prev_pts, guess, params: LKParams,
                active):
    """One pyramid level of iterative KLT.

    prev_pts: (K, 2) template positions at this level's scale.
    guess:    (K, 2) current flow estimate (position in next image).
    Returns (new_positions (K,2), ok (K,)).
    """
    dtype = prev_img.dtype
    win2 = params.window * params.window
    offsets = _window_offsets(params.window, dtype)

    ix, iy = im.scharr_derivatives(prev_img)
    t_patch = _patch(prev_img, prev_pts, offsets)      # (K, P)
    gx = _patch(ix, prev_pts, offsets)
    gy = _patch(iy, prev_pts, offsets)

    # Structure tensor per point (the KLT normal matrix).
    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / win2
    invertible = min_eig > params.min_eig_threshold
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, carry):
        pos, converged = carry
        c_patch = _patch(next_img, pos, offsets)
        diff = c_patch - t_patch
        b1 = jnp.sum(diff * gx, axis=1)
        b2 = jnp.sum(diff * gy, axis=1)
        # delta = -G^-1 b
        dx = -(gyy * b1 - gxy * b2) * inv_det
        dy = -(gxx * b2 - gxy * b1) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)
        step_ok = active & invertible & ~converged
        pos = jnp.where(step_ok[:, None], pos + delta, pos)
        converged = converged | (jnp.sum(delta * delta, axis=-1)
                                 <= params.eps * params.eps)
        return pos, converged

    pos, _ = jax.lax.fori_loop(
        0, params.iters, body,
        (guess, jnp.zeros(guess.shape[0], bool)),
    )
    h, w = prev_img.shape
    inside = (
        (pos[:, 0] >= 0) & (pos[:, 0] < w - 1)
        & (pos[:, 1] >= 0) & (pos[:, 1] < h - 1)
    )
    ok = active & invertible & inside & jnp.all(jnp.isfinite(pos), axis=-1)
    return pos, ok


def extract_patches(img, centers, window):
    """Template + Scharr gradient patches at the given centers.

    Returns (t_patch, gx, gy), each (K, window*window). Used to anchor a
    feature to its first-observation appearance so later refinement can
    correct frame-to-frame drift (cv::calcOpticalFlowPyrLK in the reference
    tracks only frame pairs, feature_tracker.cpp:130-136, and accumulates a
    per-feature random walk; the anchor pass removes it)."""
    offsets = _window_offsets(window, img.dtype)
    ix, iy = im.scharr_derivatives(img)
    return (_patch(img, centers, offsets),
            _patch(ix, centers, offsets),
            _patch(iy, centers, offsets))


def refine_template(img, t_patch, gx, gy, pos0, active, window, iters, eps,
                    max_shift):
    """Iterative KLT of explicit (anchor) template patches against ``img``
    at full resolution, starting from ``pos0``.

    Zero-mean photometric normalization makes the match robust to slow
    illumination/CLAHE drift between the anchor frame and now. The search is
    clamped to ``max_shift`` px so a stale template cannot yank a point.

    Returns (pos (K,2), ok (K,), resid (K,)) where resid is the mean
    |zero-mean diff| at the final position (0..255 scale) — the caller's
    re-anchoring signal."""
    dtype = img.dtype
    win2 = window * window
    offsets = _window_offsets(window, dtype)
    t_zm = t_patch - jnp.mean(t_patch, axis=1, keepdims=True)

    gxx = jnp.sum(gx * gx, axis=1)
    gxy = jnp.sum(gx * gy, axis=1)
    gyy = jnp.sum(gy * gy, axis=1)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) / win2
    invertible = min_eig > 1e-4
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)

    def body(_, carry):
        pos, converged = carry
        c_patch = _patch(img, pos, offsets)
        c_zm = c_patch - jnp.mean(c_patch, axis=1, keepdims=True)
        diff = c_zm - t_zm
        b1 = jnp.sum(diff * gx, axis=1)
        b2 = jnp.sum(diff * gy, axis=1)
        dx = -(gyy * b1 - gxy * b2) * inv_det
        dy = -(gxx * b2 - gxy * b1) * inv_det
        delta = jnp.stack([dx, dy], axis=-1)
        step_ok = active & invertible & ~converged
        new_pos = pos + delta
        # Clamp the total excursion from the starting estimate.
        off = new_pos - pos0
        r = jnp.sqrt(jnp.sum(off * off, axis=-1, keepdims=True))
        scale = jnp.where(r > max_shift, max_shift / jnp.maximum(r, 1e-9), 1.0)
        new_pos = pos0 + off * scale
        pos = jnp.where(step_ok[:, None], new_pos, pos)
        converged = converged | (jnp.sum(delta * delta, axis=-1)
                                 <= eps * eps)
        return pos, converged

    pos, _ = jax.lax.fori_loop(
        0, iters, body, (pos0, jnp.zeros(pos0.shape[0], bool)))

    c_patch = _patch(img, pos, offsets)
    c_zm = c_patch - jnp.mean(c_patch, axis=1, keepdims=True)
    resid = jnp.mean(jnp.abs(c_zm - t_zm), axis=1)

    h, w = img.shape
    inside = ((pos[:, 0] >= 0) & (pos[:, 0] < w - 1)
              & (pos[:, 1] >= 0) & (pos[:, 1] < h - 1))
    ok = active & invertible & inside & jnp.all(jnp.isfinite(pos), axis=-1)
    return pos, ok, resid


def track_pyramidal(
    prev_pyr: list[jax.Array],
    next_pyr: list[jax.Array],
    prev_pts: jax.Array,   # (K, 2) full-resolution positions
    active: jax.Array,     # (K,) slot validity
    params: LKParams,
) -> tuple[jax.Array, jax.Array]:
    """Coarse-to-fine track. Returns (next_pts (K, 2), status (K,))."""
    levels = len(prev_pyr) - 1
    scale_top = 2.0 ** levels
    guess = prev_pts / scale_top
    ok = active
    for lvl in range(levels, -1, -1):
        scale = 2.0 ** lvl
        pts_l = prev_pts / scale
        guess, ok_l = track_level(
            prev_pyr[lvl], next_pyr[lvl], pts_l, guess, params, active
        )
        ok = ok & ok_l
        if lvl > 0:
            guess = guess * 2.0
    return guess, ok
