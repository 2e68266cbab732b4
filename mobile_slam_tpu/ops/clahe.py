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

    # ONE one-hot pixel encoding in int8 serves both the histogram and the
    # LUT application: exact 0/1 selectors, every contraction accumulates in
    # int32, so the result stays bit-exact. The (pixels, 256) one-hot
    # intermediate is the dominant cost of this op (67 MB at int8 for
    # 512x512) — it is built over the HALF-TILE blocks the LUT-apply stage
    # needs, and each tile's histogram is recovered as the integer sum of
    # its 2x2 blocks' histograms (identical to summing over the tile
    # directly). (Element gathers, the obvious formulation, serialize on
    # TPU; see ops/lk_pallas.py.)
    bs_y, bs_x = th // 2, tw // 2
    nb = 2 * tiles
    blocks_px = xi.reshape(nb, bs_y, nb, bs_x).transpose(0, 2, 1, 3)
    blocks_px = blocks_px.reshape(nb * nb, bs_y * bs_x)
    oh_b = jax.nn.one_hot(blocks_px, 256, dtype=jnp.int8)
    bhist = jnp.sum(oh_b, axis=1, dtype=jnp.int32)          # (nb², 256)
    hist = bhist.reshape(tiles, 2, tiles, 2, 256).sum(axis=(1, 3))
    hist = hist.reshape(tiles * tiles, 256).astype(jnp.float32)

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
    # OpenCV's coordinate convention: t = p/tile_size - 0.5, indices
    # clamped. The four neighbor-tile indices are CONSTANT within each
    # half-tile block (the floor of p/tile - 0.5 changes only at half-tile
    # boundaries), so the per-pixel 4-way LUT gather becomes a batched
    # one-hot matmul per (th/2, tw/2) block — reusing oh_b from above —
    # against that block's 4 LUT rows, then the per-pixel bilinear blend.
    bi = jnp.arange(nb)
    t0 = jnp.clip((bi - 1) // 2, 0, tiles - 1)   # floor(yy) per block
    t1 = jnp.clip((bi - 1) // 2 + 1, 0, tiles - 1)

    # (nb, nb, 4) neighbor tile pairs -> flat LUT row ids, then the 4 LUTs
    # per block: (B, 4, 256). LUT values are 0..255, which does not fit
    # int8 — contract against (lut - 128) (range -128..127, exact) and add
    # the 128 back afterward: a one-hot row sums to exactly 1, so
    # onehot @ lut == onehot @ (lut - 128) + 128 in integer arithmetic.
    lut_flat = (lut.astype(jnp.int32) - 128).astype(jnp.int8)
    lut_flat = lut_flat.reshape(tiles * tiles, 256)
    ids = jnp.stack([
        t0[:, None] * tiles + t0[None, :],
        t0[:, None] * tiles + t1[None, :],
        t1[:, None] * tiles + t0[None, :],
        t1[:, None] * tiles + t1[None, :],
    ], axis=-1).reshape(nb * nb, 4)
    lut4 = lut_flat[ids]                          # (B, 4, 256) — tiny gather

    vals = jnp.einsum("bpc,bqc->bpq", oh_b, lut4,
                      preferred_element_type=jnp.int32) + 128  # (B, px, 4)
    vals = vals.reshape(nb, nb, bs_y, bs_x, 4).transpose(0, 2, 1, 3, 4)
    vals = vals.reshape(h, w, 4).astype(dtype)

    yy = jnp.arange(h, dtype=dtype) / th - 0.5
    xx = jnp.arange(w, dtype=dtype) / tw - 0.5
    fy2 = (yy - jnp.floor(yy))[:, None]
    fx2 = (xx - jnp.floor(xx))[None, :]
    out = (
        vals[..., 0] * (1 - fy2) * (1 - fx2)
        + vals[..., 1] * (1 - fy2) * fx2
        + vals[..., 2] * fy2 * (1 - fx2)
        + vals[..., 3] * fy2 * fx2
    )
    return out.astype(dtype)
