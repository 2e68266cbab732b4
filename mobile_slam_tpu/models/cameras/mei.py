"""Mei unified catadioptric camera (TPU-vectorized).

Functional equivalent of the reference ``CataCamera``
(src/common/camera_models/CataCamera.cc): unit-sphere projection with mirror
parameter ξ plus radial-tangential distortion. ``project`` parity with
spaceToPlane (CataCamera.cc:511-529), ``lift`` parity with liftProjective
(CataCamera.cc:444-503) including the 8-iteration recursive inverse
distortion.

params layout (float array, shape (9,)):
    [gamma1, gamma2, u0, v0, k1, k2, p1, p2, xi]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_PARAMS = 9
LIFT_ITERS = 20  # reference uses 8 (CataCamera.cc:479); extra iters cost nothing


def _distortion(params: jax.Array, p_u: jax.Array) -> jax.Array:
    k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
    x, y = p_u[..., 0], p_u[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    rho2 = x2 + y2
    rad = k1 * rho2 + k2 * rho2 * rho2
    dx = x * rad + 2.0 * p1 * xy + p2 * (rho2 + 2.0 * x2)
    dy = y * rad + 2.0 * p2 * xy + p1 * (rho2 + 2.0 * y2)
    return jnp.stack([dx, dy], axis=-1)


def project(params: jax.Array, pts: jax.Array) -> jax.Array:
    """3D point(s) (..., 3) -> pixel(s) (..., 2)."""
    xi = params[8]
    z = pts[..., 2] + xi * jnp.linalg.norm(pts, axis=-1)
    p_u = pts[..., 0:2] / z[..., None]
    p_d = p_u + _distortion(params, p_u)
    g1, g2, u0, v0 = params[0], params[1], params[2], params[3]
    return jnp.stack([g1 * p_d[..., 0] + u0, g2 * p_d[..., 1] + v0], axis=-1)


def lift(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) (..., 2) -> projective ray(s) (..., 3).

    Matches liftProjective: undistort by fixed-point iteration, then invert
    the unified-sphere map. The general ξ ≠ 1 branch is used (it reduces to
    the ξ = 1 special case continuously)."""
    g1, g2, u0, v0, xi = params[0], params[1], params[2], params[3], params[8]
    p_d = jnp.stack([(uv[..., 0] - u0) / g1, (uv[..., 1] - v0) / g2], axis=-1)

    def body(_, p_u):
        return p_d - _distortion(params, p_u)

    p_u = jax.lax.fori_loop(0, LIFT_ITERS, body, p_d - _distortion(params, p_d))
    rho2 = jnp.sum(p_u * p_u, axis=-1)
    z = 1.0 - xi * (rho2 + 1.0) / (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2))
    return jnp.concatenate([p_u, z[..., None]], axis=-1)


def lift_sphere(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) -> unit ray(s) on the sphere (liftSphere parity)."""
    ray = lift(params, uv)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def make_params(gamma1, gamma2, u0, v0, k1=0.0, k2=0.0, p1=0.0, p2=0.0, xi=1.0,
                dtype=jnp.float32):
    return jnp.asarray([gamma1, gamma2, u0, v0, k1, k2, p1, p2, xi], dtype=dtype)
