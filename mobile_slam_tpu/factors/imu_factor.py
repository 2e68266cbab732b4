"""Whitened IMU preintegration factor (TPU-native).

Equivalent of the reference ``IMUFactor`` (include/backend/factor/imu_factor.h):
a 15-d residual between consecutive window frames, whitened by
sqrt_info = LLT(covariance^-1).matrixL().T (imu_factor.h:37-40).

Jacobians are obtained by forward-mode autodiff of the residual w.r.t. the
manifold perturbation (quaternion ⊞) inside the solver — exactly the
linearization the reference hand-derives, with consistency guaranteed by
construction (and validated against finite differences in tests, the same way
projection_factor.cpp:87-173 validates).

float32 note: the 15x15 covariance spans ~9 orders of magnitude (bias
random-walk vs position noise), so the inversion uses diagonal equilibration
to stay well-conditioned in f32 on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mobile_slam_tpu.imu import preintegration as preint


def sqrt_info_from_cov(cov: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Upper-triangular whitening W with Wᵀ W = cov⁻¹ (batched).

    Equilibrates with D = diag(sqrt(diag(cov))) so the Cholesky runs on a
    condition-O(100) matrix even in float32:
        cov = D C D  =>  cov⁻¹ = D⁻¹ C⁻¹ D⁻¹,  C⁻¹ = Lᵀ L (upper chol)
        W = chol_upper(C⁻¹) D⁻¹.
    """
    d = jnp.sqrt(jnp.clip(jnp.diagonal(cov, axis1=-2, axis2=-1), eps, None))
    c = cov / (d[..., :, None] * d[..., None, :])
    n = cov.shape[-1]
    eye = jnp.eye(n, dtype=cov.dtype)
    c = c + eps * eye
    c_inv = jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(c), True), jnp.broadcast_to(eye, c.shape)
    )
    c_inv = 0.5 * (c_inv + jnp.swapaxes(c_inv, -1, -2))
    # chol_upper(A) = chol_lower(A reversed)ᵀ reversed; simpler: A = L Lᵀ
    # gives Wᵀ W = A with W = Lᵀ.
    l = jnp.linalg.cholesky(c_inv)
    w = jnp.swapaxes(l, -1, -2)
    return w / d[..., None, :]


def whitened_residual(
    pre: preint.Preintegration,
    p_i, q_i, v_i, ba_i, bg_i,
    p_j, q_j, v_j, ba_j, bg_j,
    gravity: jax.Array,
    sqrt_info: jax.Array,
) -> jax.Array:
    """sqrt_info @ evaluate(...) — IMUFactor::Evaluate parity (imu_factor.h:19-130)."""
    r = preint.evaluate(
        pre, p_i, q_i, v_i, ba_i, bg_i, p_j, q_j, v_j, ba_j, bg_j, gravity
    )
    return jnp.einsum("...ij,...j->...i", sqrt_info, r)
