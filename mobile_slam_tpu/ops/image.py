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
    """Separable 2D correlation with reflect-101 padding (OpenCV default)."""
    rx = kx.shape[0] // 2
    ry = ky.shape[0] // 2
    # Pad reflect-101 (edge pixel not duplicated), like cv2.BORDER_REFLECT_101.
    # NOTE: lax.conv computes cross-correlation, which is exactly what
    # cv2.sepFilter2D does — kernels are used unflipped.
    p = jnp.pad(img, ((ry, ry), (rx, rx)), mode="reflect")
    p = jax.lax.conv_general_dilated(
        p[None, None], ky[None, None, :, None],
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    p = jax.lax.conv_general_dilated(
        p[None, None], kx[None, None, None, :],
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    return p


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
