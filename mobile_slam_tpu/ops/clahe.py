"""CLAHE — contrast-limited adaptive histogram equalization (TPU-native).

Replaces cv::createCLAHE(3.0, {8, 8}) in the reference preprocessing
(FeatureTracker::detectAndTrack, src/frontend/feature_tracker.cpp:102-108):
per-tile 256-bin histograms (computed as one one-hot contraction — an
MXU-friendly matmul), clip-and-redistribute at the clip limit, CDF lookup
tables, and bilinear blending of the four neighboring tile mappings per
pixel, matching OpenCV's algorithm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clahe(
    img: jax.Array,             # (H, W) float, values 0..255
    clip_limit: float = 3.0,
    tiles: int = 8,
) -> jax.Array:
    h, w = img.shape
    assert h % tiles == 0 and w % tiles == 0, "image must divide into tiles"
    th, tw = h // tiles, w // tiles
    area = th * tw
    dtype = img.dtype

    x = jnp.clip(img, 0.0, 255.0)
    xi = jnp.round(x).astype(jnp.int32)

    # Per-tile histograms via one-hot contraction: (T, area) x 256.
    tiles_px = xi.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    tiles_px = tiles_px.reshape(tiles * tiles, area)
    onehot = jax.nn.one_hot(tiles_px, 256, dtype=dtype)       # (T, area, 256)
    hist = jnp.sum(onehot, axis=1)                            # (T, 256)

    # Clip + redistribute (OpenCV semantics: limit = max(clip*area/256, 1)).
    limit = jnp.maximum(clip_limit * area / 256.0, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)
    clipped = clipped + excess / 256.0

    # CDF -> LUT with OpenCV's scaling: lut = round(cdf * 255 / area).
    cdf = jnp.cumsum(clipped, axis=1)
    lut = jnp.round(cdf * (255.0 / area))
    lut = lut.reshape(tiles, tiles, 256)

    # Bilinear interpolation between the 4 surrounding tile LUTs, with
    # OpenCV's coordinate convention: t = p/tile_size - 0.5, indices clamped
    # (at the borders both neighbors clamp to the same tile, so the weight
    # becomes irrelevant).
    yy = jnp.arange(h, dtype=dtype) / th - 0.5
    xx = jnp.arange(w, dtype=dtype) / tw - 0.5
    fy = yy - jnp.floor(yy)
    fx = xx - jnp.floor(xx)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(jnp.floor(yy).astype(jnp.int32) + 1, 0, tiles - 1)
    x1 = jnp.clip(jnp.floor(xx).astype(jnp.int32) + 1, 0, tiles - 1)

    fy2 = fy[:, None]
    fx2 = fx[None, :]
    v00 = lut[y0[:, None], x0[None, :], xi]
    v01 = lut[y0[:, None], x1[None, :], xi]
    v10 = lut[y1[:, None], x0[None, :], xi]
    v11 = lut[y1[:, None], x1[None, :], xi]
    out = (
        v00 * (1 - fy2) * (1 - fx2)
        + v01 * (1 - fy2) * fx2
        + v10 * fy2 * (1 - fx2)
        + v11 * fy2 * fx2
    )
    return out.astype(dtype)
