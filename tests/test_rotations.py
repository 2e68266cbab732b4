"""Unit tests for quaternion/rotation utilities (mirrors the reference's
Utility helpers, include/utility/utility.h)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from mobile_slam_tpu.utils import rotations as rot


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    # scipy uses xyzw
    return np.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)


class TestQuaternionCore:
    def test_mul_matches_scipy(self):
        q1, q2 = random_quats(16, 1), random_quats(16, 2)
        got = np.asarray(rot.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        want = (ScipyRot.from_quat(to_scipy(q1)) * ScipyRot.from_quat(to_scipy(q2))).as_quat()
        want = np.concatenate([want[..., 3:4], want[..., 0:3]], axis=-1)
        # Quaternion double cover: compare up to sign.
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-12)

    def test_rotate_matches_matrix(self):
        q = random_quats(16, 3)
        v = np.random.default_rng(4).normal(size=(16, 3))
        got = np.asarray(rot.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
        want = np.einsum("nij,nj->ni", ScipyRot.from_quat(to_scipy(q)).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_quat_to_rot_roundtrip(self):
        q = random_quats(64, 5)
        r = rot.quat_to_rot(jnp.asarray(q))
        q2 = np.asarray(rot.rot_to_quat(r))
        sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
        np.testing.assert_allclose(q2 * sign, q, atol=1e-12)

    def test_rot_to_quat_near_identity_and_pi(self):
        for angle in [0.0, 1e-9, np.pi - 1e-6, np.pi]:
            r = ScipyRot.from_rotvec([angle, 0, 0]).as_matrix()
            q = np.asarray(rot.rot_to_quat(jnp.asarray(r)))
            r2 = np.asarray(rot.quat_to_rot(jnp.asarray(q)))
            np.testing.assert_allclose(r2, r, atol=1e-9)

    def test_conjugate_is_inverse(self):
        q = jnp.asarray(random_quats(8, 6))
        ident = rot.quat_mul(q, rot.quat_conjugate(q))
        np.testing.assert_allclose(np.asarray(ident[..., 0]), 1.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(ident[..., 1:]), 0.0, atol=1e-12)


class TestSmallAngleAndMatrices:
    def test_delta_q_unnormalized_first_order(self):
        """deltaQ must be (1, θ/2) exactly — NOT normalized — to match the
        reference's Utility::deltaQ used inside preintegration."""
        theta = jnp.asarray([0.02, -0.04, 0.06])
        dq = np.asarray(rot.delta_q(theta))
        np.testing.assert_allclose(dq, [1.0, 0.01, -0.02, 0.03], atol=0)

    def test_qleft_qright(self):
        q = jnp.asarray(random_quats(8, 7))
        p = jnp.asarray(random_quats(8, 8))
        prod = rot.quat_mul(q, p)
        left = jnp.einsum("nij,nj->ni", rot.q_left(q), p)
        right = jnp.einsum("nij,nj->ni", rot.q_right(p), q)
        np.testing.assert_allclose(np.asarray(left), np.asarray(prod), atol=1e-12)
        np.testing.assert_allclose(np.asarray(right), np.asarray(prod), atol=1e-12)

    def test_skew(self):
        v = jnp.asarray([1.0, 2.0, 3.0])
        w = jnp.asarray([-0.3, 0.5, 0.9])
        np.testing.assert_allclose(
            np.asarray(rot.skew(v) @ w), np.cross(np.asarray(v), np.asarray(w)), atol=1e-12
        )


class TestEulerAndGravity:
    def test_ypr_roundtrip(self):
        ypr = jnp.asarray([[30.0, 20.0, -40.0], [-120.0, 5.0, 85.0]])
        got = np.asarray(rot.r2ypr(rot.ypr2r(ypr)))
        np.testing.assert_allclose(got, np.asarray(ypr), atol=1e-9)

    def test_g2r_aligns_gravity_and_zero_yaw(self):
        g = jnp.asarray([0.3, -0.4, 9.7])
        r0 = rot.g2r(g)
        aligned = r0 @ (g / jnp.linalg.norm(g))
        np.testing.assert_allclose(np.asarray(aligned), [0, 0, 1.0], atol=1e-12)
        yaw = np.asarray(rot.r2ypr(r0))[0]
        assert abs(yaw) < 1e-9

    def test_boxplus_boxminus(self):
        q = jnp.asarray(random_quats(8, 9))
        dtheta = jnp.asarray(np.random.default_rng(10).normal(size=(8, 3)) * 1e-3)
        q2 = rot.quat_boxplus(q, dtheta)
        back = np.asarray(rot.quat_boxminus(q2, q))
        np.testing.assert_allclose(back, np.asarray(dtheta), atol=1e-7)


class TestJitAndVmap:
    def test_all_jit_and_vmap(self):
        q = jnp.asarray(random_quats(4, 11), dtype=jnp.float32)
        v = jnp.asarray(np.random.default_rng(12).normal(size=(4, 3)), dtype=jnp.float32)
        jitted = jax.jit(lambda q, v: rot.quat_rotate(q, v))
        np.testing.assert_allclose(
            np.asarray(jitted(q, v)),
            np.asarray(rot.quat_rotate(q, v)),
            atol=1e-6,
        )
        vm = jax.vmap(rot.quat_to_rot)(q)
        assert vm.shape == (4, 3, 3)
