"""Visual reprojection factor (TPU-native, batched).

Equivalent of the reference ``ProjectionFactor``
(src/backend/factor/projection_factor.cpp:12-85): a feature parameterized by
inverse depth in its anchor frame i is transported through the
body/extrinsic chain into frame j and compared against the observed unit-z
ray. Residual is whitened by the static sqrt_info = (focal/1.5) I₂ set at
estimator setup (src/backend/estimator.cpp:29-30).

Everything broadcasts: the solver calls this once over the full
(features x window) observation grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mobile_slam_tpu.utils import rotations as rot


def residual(
    ray_i: jax.Array,    # (..., 3) anchor observation, unit-z
    ray_j: jax.Array,    # (..., 3) target observation, unit-z
    inv_dep: jax.Array,  # (...,) inverse depth in anchor frame
    p_i: jax.Array, q_i: jax.Array,   # anchor body pose
    p_j: jax.Array, q_j: jax.Array,   # target body pose
    t_ic: jax.Array, q_ic: jax.Array, # camera-to-IMU extrinsics
    sqrt_info: jax.Array,             # () scalar focal/1.5
    vel_i: jax.Array | None = None,   # (..., 2) anchor normalized-plane velocity
    vel_j: jax.Array | None = None,   # (..., 2) target normalized-plane velocity
    td: jax.Array | None = None,      # () camera-IMU time offset (seconds)
) -> jax.Array:
    """2-d whitened reprojection residual (projection_factor.cpp:24-34).

    With (vel_i, vel_j, td) given, observations are corrected for the
    camera-IMU time offset before projection (VINS-Fusion ProjectionTdFactor
    idea): the feature reported at image time t was really sampled at
    t + td, so its position at the IMU-aligned time is ray - td * vel.
    The reference lacks td estimation entirely
    (docs/analysis-report.md:408-418)."""
    if td is not None:
        ray_i = ray_i - td * jnp.concatenate(
            [vel_i, jnp.zeros_like(vel_i[..., :1])], axis=-1)
        ray_j = ray_j - td * jnp.concatenate(
            [vel_j, jnp.zeros_like(vel_j[..., :1])], axis=-1)
    pts_cam_i = ray_i / inv_dep[..., None]
    pts_imu_i = rot.quat_rotate(q_ic, pts_cam_i) + t_ic
    pts_w = rot.quat_rotate(q_i, pts_imu_i) + p_i
    pts_imu_j = rot.quat_rotate(rot.quat_conjugate(q_j), pts_w - p_j)
    pts_cam_j = rot.quat_rotate(rot.quat_conjugate(q_ic), pts_imu_j - t_ic)
    dep_j = pts_cam_j[..., 2]
    safe_dep = jnp.where(jnp.abs(dep_j) < 1e-8,
                         jnp.where(dep_j < 0, -1e-8, 1e-8), dep_j)
    r = pts_cam_j[..., 0:2] / safe_dep[..., None] - ray_j[..., 0:2]
    return sqrt_info * r


def cauchy_weight(r: jax.Array, scale: float = 1.0) -> jax.Array:
    """IRLS weight sqrt(ρ'(s)) for CauchyLoss(scale) with s = ||r||²
    (optimizer.cpp:106 uses CauchyLoss(1.0)). The returned w multiplies the
    residual and its Jacobian rows — the rho2<0 Triggs corrector branch the
    reference marginalization applies (marginalization_factor.cpp:22-50)."""
    s = jnp.sum(r * r, axis=-1)
    c2 = scale * scale
    rho_p = 1.0 / (1.0 + s / c2)
    return jnp.sqrt(rho_p)
