"""Quaternion / rotation utilities (TPU-native, dtype-polymorphic).

Quaternions are stored as ``(w, x, y, z)`` (Hamilton convention, scalar first).
Every function broadcasts over arbitrary leading batch dimensions so the same
code serves scalar host math, vmapped per-feature math, and batched
multi-sequence VIO.

Reference parity: mirrors the quaternion helpers of the C++ engine
(``include/utility/utility.h:24-141``, ``src/utility/utility.cc:11-20``):
``deltaQ`` (small-angle quaternion, deliberately *unnormalized* to match the
reference's first-order behavior), ``skewSymmetric``, ``Qleft``/``Qright``,
``R2ypr``/``ypr2R`` (degrees), and ``g2R`` (gravity-aligned, yaw-zeroed frame).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array) -> jax.Array:
    """Return the unit quaternion q/|q|."""
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2, wxyz layout, broadcasting over leading dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q: R(q) @ v."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Unit quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rot_to_quat(r: jax.Array) -> jax.Array:
    """3x3 rotation matrix -> unit quaternion wxyz (branchless Shepperd).

    Computes all four candidate solutions and selects the numerically best
    (largest pivot) with ``where`` so it jits and vmaps cleanly.
    """
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its pivot 4*q_k^2 = 1 + 2*m_kk - tr (or 1+tr).
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22,
                        1.0 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)

    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4 comps)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0).astype(q.dtype)


def delta_q(theta: jax.Array) -> jax.Array:
    """Small-angle quaternion (1, θ/2) — unnormalized, matching the reference
    ``Utility::deltaQ`` (include/utility/utility.h:24-36)."""
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return jnp.concatenate([one, half], axis=-1)


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]x (batched)."""
    zero = jnp.zeros_like(v[..., 0])
    row = jnp.stack(
        [zero, -v[..., 2], v[..., 1],
         v[..., 2], zero, -v[..., 0],
         -v[..., 1], v[..., 0], zero],
        axis=-1,
    )
    return row.reshape(v.shape[:-1] + (3, 3))


def q_left(q: jax.Array) -> jax.Array:
    """Left-multiplication matrix: q_left(q) @ p(vec4) == quat_mul(q, p)."""
    w = q[..., 0]
    v = q[..., 1:4]
    eye = jnp.eye(3, dtype=q.dtype)
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def q_right(q: jax.Array) -> jax.Array:
    """Right-multiplication matrix: q_right(p) @ q(vec4) == quat_mul(q, p)."""
    w = q[..., 0]
    v = q[..., 1:4]
    eye = jnp.eye(3, dtype=q.dtype)
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bottom = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * eye - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bottom], axis=-2)


def r2ypr(r: jax.Array) -> jax.Array:
    """Rotation matrix -> (yaw, pitch, roll) in DEGREES, ZYX convention
    (matches ``Utility::R2ypr``, include/utility/utility.h:81-95)."""
    n = r[..., :, 0]
    o = r[..., :, 1]
    a = r[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    rr = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, rr], axis=-1) * (180.0 / jnp.pi)


def ypr2r(ypr: jax.Array) -> jax.Array:
    """(yaw, pitch, roll) in DEGREES -> rotation matrix Rz(y)Ry(p)Rx(r)."""
    rad = ypr * (jnp.pi / 180.0)
    y, p, r = rad[..., 0], rad[..., 1], rad[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(ypr.shape[:-1] + (3, 3))


def quat_from_two_vectors(a: jax.Array, b: jax.Array) -> jax.Array:
    """Shortest-arc unit quaternion rotating unit-ish vector a onto b."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    d = jnp.sum(a * b, axis=-1)
    w = 1.0 + d
    # Antipodal fallback: rotate 180° about any axis ⟂ a.
    ortho = jnp.where(
        jnp.abs(a[..., 0:1]) < 0.9,
        jnp.cross(a, jnp.asarray([1.0, 0.0, 0.0], dtype=a.dtype) * jnp.ones_like(a)),
        jnp.cross(a, jnp.asarray([0.0, 1.0, 0.0], dtype=a.dtype) * jnp.ones_like(a)),
    )
    ortho = ortho / jnp.linalg.norm(ortho, axis=-1, keepdims=True)
    near_pi = w[..., None] < 1e-8
    q = jnp.concatenate([w[..., None], c], axis=-1)
    q = jnp.where(near_pi, jnp.concatenate([jnp.zeros_like(w[..., None]), ortho], axis=-1), q)
    return quat_normalize(q)


def g2r(g: jax.Array) -> jax.Array:
    """Rotation taking measured gravity direction to +z with zero yaw
    (matches ``Utility::g2R``, src/utility/utility.cc:11-20)."""
    ng1 = g / jnp.linalg.norm(g, axis=-1, keepdims=True)
    ng2 = jnp.asarray([0.0, 0.0, 1.0], dtype=g.dtype)
    r0 = quat_to_rot(quat_from_two_vectors(ng1, jnp.broadcast_to(ng2, ng1.shape)))
    yaw = r2ypr(r0)[..., 0]
    fix = ypr2r(jnp.stack([-yaw, jnp.zeros_like(yaw), jnp.zeros_like(yaw)], axis=-1))
    return fix @ r0


def quat_boxplus(q: jax.Array, dtheta: jax.Array) -> jax.Array:
    """Manifold ⊞: q ⊗ deltaQ(dθ), normalized — matches
    ``PoseLocalParameterization::Plus`` (src/backend/factor/pose_local_parameterization.cpp:6-21)."""
    return quat_normalize(quat_mul(q, delta_q(dtheta)))


def quat_boxminus(q1: jax.Array, q0: jax.Array) -> jax.Array:
    """Manifold ⊟: 2 * vec(q0^{-1} ⊗ q1), the local tangent difference."""
    dq = quat_mul(quat_conjugate(q0), q1)
    # Keep the short geodesic: flip sign if w < 0.
    dq = dq * jnp.where(dq[..., 0:1] < 0, -1.0, 1.0).astype(dq.dtype)
    return 2.0 * dq[..., 1:4]
