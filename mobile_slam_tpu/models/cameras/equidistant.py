"""Kannala-Brandt equidistant fisheye camera (TPU-vectorized).

Functional equivalent of the reference ``EquidistantCamera``
(src/common/camera_models/EquidistantCamera.cc): r(θ) = θ + k2 θ³ + k3 θ⁵ +
k4 θ⁷ + k5 θ⁹ (k1 = 1 implicit), project via
(EquidistantCamera.cc:357-366), lift via backprojectSymmetric
(EquidistantCamera.cc:337-349).

The reference solves the θ-polynomial with a companion-matrix eigendecomposition;
here we use fixed-iteration Newton from θ₀ = r — r(θ) is monotone on the
fisheye's working range so this converges quadratically and jits cleanly.

params layout (float array, shape (8,)):
    [mu, mv, u0, v0, k2, k3, k4, k5]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_PARAMS = 8
NEWTON_ITERS = 10


def _r_theta(params: jax.Array, theta: jax.Array) -> jax.Array:
    k2, k3, k4, k5 = params[4], params[5], params[6], params[7]
    t2 = theta * theta
    return theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))


def _r_prime(params: jax.Array, theta: jax.Array) -> jax.Array:
    k2, k3, k4, k5 = params[4], params[5], params[6], params[7]
    t2 = theta * theta
    return 1.0 + t2 * (3.0 * k2 + t2 * (5.0 * k3 + t2 * (7.0 * k4 + t2 * 9.0 * k5)))


def project(params: jax.Array, pts: jax.Array) -> jax.Array:
    """3D point(s) (..., 3) -> pixel(s) (..., 2)."""
    norm = jnp.linalg.norm(pts, axis=-1)
    theta = jnp.arccos(jnp.clip(pts[..., 2] / norm, -1.0, 1.0))
    phi = jnp.arctan2(pts[..., 1], pts[..., 0])
    r = _r_theta(params, theta)
    mu, mv, u0, v0 = params[0], params[1], params[2], params[3]
    return jnp.stack(
        [mu * r * jnp.cos(phi) + u0, mv * r * jnp.sin(phi) + v0], axis=-1
    )


def lift(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) (..., 2) -> unit ray(s) (..., 3) on the sphere
    (sinθcosφ, sinθsinφ, cosθ), backprojectSymmetric parity."""
    mu, mv, u0, v0 = params[0], params[1], params[2], params[3]
    p_u = jnp.stack(
        [(uv[..., 0] - u0) / mu, (uv[..., 1] - v0) / mv], axis=-1
    )
    phi = jnp.arctan2(p_u[..., 1], p_u[..., 0])
    r_obs = jnp.linalg.norm(p_u, axis=-1)

    def newton(_, theta):
        f = _r_theta(params, theta) - r_obs
        fp = _r_prime(params, theta)
        return theta - f / jnp.where(jnp.abs(fp) < 1e-12, 1e-12, fp)

    theta = jax.lax.fori_loop(0, NEWTON_ITERS, newton, r_obs)
    st = jnp.sin(theta)
    return jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], axis=-1
    )


def lift_unit_plane(params: jax.Array, uv: jax.Array) -> jax.Array:
    """Pixel(s) -> ray normalized to z=1 (the 7-vector convention the
    estimator consumes, include/common/image_frame.h:14)."""
    ray = lift(params, uv)
    return ray / ray[..., 2:3]


def make_params(mu, mv, u0, v0, k2=0.0, k3=0.0, k4=0.0, k5=0.0, dtype=jnp.float32):
    return jnp.asarray([mu, mv, u0, v0, k2, k3, k4, k5], dtype=dtype)
