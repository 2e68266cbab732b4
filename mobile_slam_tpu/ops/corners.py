"""Shi-Tomasi corner detection with grid-cell suppression (TPU-native).

Replaces cv::goodFeaturesToTrack + the sequential min-distance mask paint of
the reference (FeatureTracker::setMask, src/frontend/feature_tracker.cpp:38-87,
and the Shi-Tomasi refill at :185-186): the min-eigenvalue response map is
computed densely (Sobel structure tensor, 3x3 block), existing tracked points
suppress a min_dist neighborhood via max-pooled occupancy, and detection
picks the best corner per min_dist-sized grid cell followed by a global
top-k — a data-parallel analog of OpenCV's greedy distance filter that
preserves its two invariants (spatial spread, strongest-response priority).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mobile_slam_tpu.ops import image as im


def _max_pool_same(x: jax.Array, k: int) -> jax.Array:
    """k x k max pool, stride 1, SAME — as two 1-D passes (max is
    separable). XLA's TPU lowering of a 2-D reduce_window walks the full
    k*k window per pixel (O(k^2)); the separable form is O(k) and
    identical."""
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (k, 1), (1, 1),
                              "SAME")
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k), (1, 1),
                                 "SAME")


def min_eig_response(img: jax.Array, block_size: int = 3) -> jax.Array:
    """cornerMinEigenVal equivalent: smaller eigenvalue of the Sobel
    structure tensor box-summed over block_size."""
    ix, iy = im.sobel_derivatives(img)
    # OpenCV scales gradients by 1/(2^(aperture+block-4)... ) — constant scale
    # does not change the ranking; we normalize by block area instead.
    sxx = im.box_filter(ix * ix, block_size)
    sxy = im.box_filter(ix * iy, block_size)
    syy = im.box_filter(iy * iy, block_size)
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))
    return 0.5 * (tr - disc)


def occupancy_suppression(
    response: jax.Array,
    pts: jax.Array,        # (K, 2) existing points (x, y)
    active: jax.Array,     # (K,)
    min_dist: int,
) -> jax.Array:
    """Zero the response within ~min_dist of existing points (the mask-paint
    in setMask, feature_tracker.cpp:64-87), via splat + max-pool dilation."""
    h, w = response.shape
    occ = jnp.zeros((h, w), response.dtype)
    xi = jnp.clip(jnp.round(pts[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pts[:, 1]).astype(jnp.int32), 0, h - 1)
    xi = jnp.where(active, xi, w)  # drop inactive out of bounds
    occ = occ.at[yi, xi].set(1.0, mode="drop")
    occ = _max_pool_same(occ, 2 * min_dist + 1)
    return jnp.where(occ > 0, 0.0, response)


def detect_grid(
    response: jax.Array,
    cell: int,
    max_new: int,
    quality_level: float = 0.01,
    border: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Best corner per cell x cell grid cell, then global top-`max_new`.

    Returns (pts (max_new, 2) float (x, y), valid (max_new,)). Invalid slots
    hold (0, 0).
    """
    h, w = response.shape
    r = response
    # Border exclusion (the reference drops border features, :138-147).
    mask = jnp.zeros_like(r).at[border:h - border, border:w - border].set(1.0)
    r = r * mask
    thresh = quality_level * jnp.max(r)
    r = jnp.where(r >= thresh, r, 0.0)

    # Non-max suppression with a (2*cell+1) window: a survivor is the strict
    # maximum over a neighborhood containing every point within `cell`
    # pixels, so survivors are pairwise > cell apart — the guarantee
    # OpenCV's greedy distance filter provides. Deterministic index-based
    # jitter breaks plateaus.
    iota = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)).astype(r.dtype)
    r_j = jnp.where(r > 0, r * (1.0 + 1e-6) + iota * 1e-7, 0.0)
    # Half-window NMS: guarantees pairwise spacing > cell/2 with a corner
    # density matching OpenCV's greedy filter (full-window NMS ~3x
    # undercounts because it demands mutual dominance, a stronger condition
    # than the reference's one-sided greedy check).
    local_max = _max_pool_same(r_j, cell + 1)
    is_peak = (r_j > 0) & (r_j >= local_max)
    peaks = jnp.where(is_peak, r_j, 0.0)

    # NMS survivors are pairwise > cell//2 Chebyshev apart, so an aligned
    # b x b block with b <= cell//2 + 1 holds at most one survivor —
    # block-max reduction before top_k is lossless and shrinks the top_k
    # from h*w to (h/b)*(w/b) candidates (top_k is the expensive op on
    # TPU: 2.6 ms over 512^2 vs ~0.1 ms over 64^2, dev_stage_timing).
    b = 1
    while b * 2 <= min(cell // 2 + 1, 16):
        b *= 2
    hp = -(-h // b) * b
    wp = -(-w // b) * b
    if (hp, wp) != (h, w):
        peaks = jnp.pad(peaks, ((0, hp - h), (0, wp - w)))
    hb, wb = hp // b, wp // b
    blk = peaks.reshape(hb, b, wb, b).transpose(0, 2, 1, 3).reshape(
        hb, wb, b * b)
    vals = jnp.max(blk, axis=-1)
    off = jnp.argmax(blk, axis=-1).astype(jnp.int32)
    ys = (jnp.arange(hb, dtype=jnp.int32)[:, None] * b + off // b)
    xs = (jnp.arange(wb, dtype=jnp.int32)[None, :] * b + off % b)

    top_val, top_idx = jax.lax.top_k(vals.reshape(-1), max_new)
    pts = jnp.stack(
        [xs.reshape(-1)[top_idx].astype(r.dtype),
         ys.reshape(-1)[top_idx].astype(r.dtype)],
        axis=-1,
    )
    valid = top_val > 0
    pts = jnp.where(valid[:, None], pts, 0.0)
    return pts, valid
