"""Scaramuzza omnidirectional polynomial camera (TPU-vectorized).

Functional equivalent of the reference ``OCAMCamera``
(src/common/camera_models/ScaramuzzaCamera.cc): forward polynomial lift
(ScaramuzzaCamera.cc liftProjective), inverse polynomial project
(spaceToPlane), plus the affine sensor-misalignment transform (c, d, e).
``fit_inverse_poly`` provides the least-squares inverse fit the reference
does in ``polyfit`` (ScaramuzzaCamera.cc:31-64).

params: dict of arrays
    poly:      (P,)  forward polynomial coefficients (rho -> z)
    inv_poly:  (Q,)  inverse polynomial coefficients (theta -> rho)
    center:    (2,)  image center (cx, cy)
    affine:    (3,)  (c, d, e)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

POLY_SIZE = 5       # SCARAMUZZA_POLY_SIZE
INV_POLY_SIZE = 12  # typical inverse fit order


def _polyval(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """sum_i coeffs[i] * x^i, Horner form, batched over x."""
    acc = jnp.zeros_like(x)
    for c in reversed(list(coeffs)):
        acc = acc * x + c
    return acc


def lift(params: dict, uv: jax.Array) -> jax.Array:
    """Pixel(s) (..., 2) -> projective ray(s) (..., 3) (liftProjective parity:
    ray = (xc, yc, -poly(rho)) with the affine-corrected radius)."""
    cx, cy = params["center"][0], params["center"][1]
    c, d, e = params["affine"][0], params["affine"][1], params["affine"][2]
    xc = uv[..., 0] - cx
    yc = uv[..., 1] - cy
    inv_scale = 1.0 / (c - d * e)
    xa = inv_scale * (xc - d * yc)
    ya = inv_scale * (-e * xc + c * yc)
    rho = jnp.sqrt(xa * xa + ya * ya)
    z = _polyval(params["poly"], rho)
    return jnp.stack([xc, yc, -z], axis=-1)


def project(params: dict, pts: jax.Array) -> jax.Array:
    """3D point(s) (..., 3) -> pixel(s) (..., 2) (spaceToPlane parity)."""
    norm = jnp.sqrt(pts[..., 0] ** 2 + pts[..., 1] ** 2)
    theta = jnp.arctan2(-pts[..., 2], norm)
    rho = _polyval(params["inv_poly"], theta)
    inv_norm = 1.0 / jnp.where(norm < 1e-12, 1e-12, norm)
    xn = pts[..., 0] * inv_norm * rho
    yn = pts[..., 1] * inv_norm * rho
    c, d, e = params["affine"][0], params["affine"][1], params["affine"][2]
    cx, cy = params["center"][0], params["center"][1]
    return jnp.stack([xn * c + yn * d + cx, xn * e + yn + cy], axis=-1)


def fit_inverse_poly(poly: np.ndarray, max_rho: float,
                     order: int = INV_POLY_SIZE - 1) -> np.ndarray:
    """Least-squares fit of rho(theta) from the forward polynomial, mirroring
    the reference's polyfit (ScaramuzzaCamera.cc:31-64). Host-side, float64."""
    rho = np.linspace(1e-4, max_rho, 1000)
    z = np.polyval(poly[::-1], rho)
    theta = np.arctan2(z, rho)  # note: z = poly(rho), ray z = -z, theta = atan2(-pz, norm)
    A = np.stack([theta**i for i in range(order + 1)], axis=-1)
    coeffs, *_ = np.linalg.lstsq(A, rho, rcond=None)
    return coeffs


def make_params(poly, inv_poly, center, affine=(1.0, 0.0, 0.0), dtype=jnp.float32):
    return {
        "poly": jnp.asarray(poly, dtype=dtype),
        "inv_poly": jnp.asarray(inv_poly, dtype=dtype),
        "center": jnp.asarray(center, dtype=dtype),
        "affine": jnp.asarray(affine, dtype=dtype),
    }
