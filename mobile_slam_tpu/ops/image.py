"""Image primitives shared by the frontend kernels (TPU-native).

Bilinear sampling, separable Gaussian pyrDown, and Scharr derivatives — the
building blocks the reference gets from OpenCV (buildOpticalFlowPyramid /
calcScharrDeriv inside calcOpticalFlowPyrLK, used by
src/frontend/feature_tracker.cpp:123-136).

Images are (H, W) float arrays (0..255 scale), batched ops take point arrays
of shape (..., 2) in (x, y) pixel coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Bilinear interpolation at float (x, y) coords, border-clamped.
    img: (H, W); xy: (..., 2) -> (...)."""
    h, w = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.000001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.000001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _sep_filter(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable 2D correlation with reflect-101 padding (OpenCV default).

    Implemented as shift-and-add over statically-shifted slices rather
    than lax.conv: a batch-1 single-channel conv starves the MXU and hits
    XLA's slow TPU path, while K shifted VPU multiply-adds fuse into a
    handful of elementwise passes. Cross-correlation (unflipped kernels),
    exactly like cv2.sepFilter2D."""
    h, w = img.shape
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    # Pad reflect-101 (edge pixel not duplicated), cv2.BORDER_REFLECT_101.
    p = jnp.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    acc = jnp.zeros((h, w + 2 * rx), img.dtype)
    for j in range(ky.shape[0]):
        acc = acc + ky[j] * p[j:j + h, :]
    out = jnp.zeros((h, w), img.dtype)
    for i in range(kx.shape[0]):
        out = out + kx[i] * acc[:, i:i + w]
    return out


GAUSS5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def pyr_down(img: jax.Array) -> jax.Array:
    """cv2.pyrDown equivalent: 5x5 Gaussian then 2x decimation."""
    k = GAUSS5.astype(img.dtype)
    blurred = _sep_filter(img, k, k)
    return blurred[::2, ::2]


def build_pyramid(img: jax.Array, levels: int) -> list[jax.Array]:
    """Image pyramid with `levels+1` octaves (level 0 = full res), matching
    cv2.buildOpticalFlowPyramid's structure."""
    pyr = [img]
    for _ in range(levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def scharr_derivatives(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr 3x3 x/y derivatives scaled by 1/32 — what OpenCV's pyramidal LK
    uses for the template gradient (calcScharrDeriv)."""
    d = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)
    s = jnp.asarray([3.0, 10.0, 3.0], img.dtype) / 32.0
    ix = _sep_filter(img, d, s)
    iy = _sep_filter(img, s, d)
    return ix, iy


def sobel_derivatives(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Sobel 3x3 derivatives (aperture 3) as used by cornerMinEigenVal."""
    d = jnp.asarray([-1.0, 0.0, 1.0], img.dtype)
    s = jnp.asarray([1.0, 2.0, 1.0], img.dtype)
    ix = _sep_filter(img, d, s)
    iy = _sep_filter(img, s, d)
    return ix, iy


def box_filter(img: jax.Array, size: int) -> jax.Array:
    """size x size box sum (not normalized) with reflect-101 padding."""
    k = jnp.ones((size,), img.dtype)
    return _sep_filter(img, k, k)


def downsample2x(img: jax.Array) -> jax.Array:
    """2x2 box downsample (the mobile app's preprocessing,
    web/js/app.js:337)."""
    h2 = (img.shape[0] // 2) * 2
    w2 = (img.shape[1] // 2) * 2
    c = img[:h2, :w2]
    return 0.25 * (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
