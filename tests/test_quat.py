"""Golden + property tests for the rotation math core.

Mirrors the reference's poselib rotation tests
(poselib/poselib/core/tests/test_rotation.py) plus golden checks of the
PULSE-specific encodings (tan-norm, exp-map, heading) against independent
numpy/scipy-style constructions.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu import ops


def random_quats(rng, shape=(64,)):
    q = rng.normal(size=shape + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


def np_quat_to_mat(q):
    """Independent reference: rotation matrix from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack(
        [
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


class TestQuatBasics:
    def test_identity_rotation(self):
        v = jnp.asarray(np.random.default_rng(1).normal(size=(16, 3)))
        q = ops.quat_identity((16,))
        np.testing.assert_allclose(ops.quat_rotate(q, v), v, atol=1e-6)

    def test_mul_associative(self, rng):
        a, b, c = (random_quats(rng) for _ in range(3))
        lhs = ops.quat_mul(ops.quat_mul(a, b), c)
        rhs = ops.quat_mul(a, ops.quat_mul(b, c))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = random_quats(rng)
        v = jnp.asarray(rng.normal(size=(64, 3)))
        got = ops.quat_rotate(q, v)
        want = np.einsum("...ij,...j->...i", np_quat_to_mat(np.asarray(q)), np.asarray(v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotate_inverse_roundtrip(self, rng):
        q = random_quats(rng)
        v = jnp.asarray(rng.normal(size=(64, 3)))
        np.testing.assert_allclose(
            ops.quat_rotate_inverse(q, ops.quat_rotate(q, v)), v, atol=1e-5
        )

    def test_mul_inverse_is_identity(self, rng):
        q = random_quats(rng)
        prod = ops.quat_mul(q, ops.quat_inverse(q))
        np.testing.assert_allclose(
            ops.quat_positive(prod), ops.quat_identity((64,)), atol=1e-5
        )

    def test_quat_rotate_composition(self, rng):
        a, b = random_quats(rng), random_quats(rng)
        v = jnp.asarray(rng.normal(size=(64, 3)))
        np.testing.assert_allclose(
            ops.quat_rotate(ops.quat_mul(a, b), v),
            ops.quat_rotate(a, ops.quat_rotate(b, v)),
            atol=1e-5,
        )


class TestAngleAxisExpMap:
    def test_angle_axis_roundtrip(self, rng):
        angle = jnp.asarray(rng.uniform(-3.0, 3.0, size=(64,)))
        axis = rng.normal(size=(64, 3))
        axis = jnp.asarray(axis / np.linalg.norm(axis, axis=-1, keepdims=True))
        q = ops.quat_from_angle_axis(angle, axis)
        a2, ax2 = ops.quat_to_angle_axis(q)
        # angle/axis have a joint sign ambiguity: compare angle*axis
        np.testing.assert_allclose(a2[..., None] * ax2, angle[..., None] * axis, atol=1e-4)

    def test_exp_map_roundtrip(self, rng):
        # exp map is only invertible on the principal ball |em| < pi
        em = rng.normal(size=(64, 3))
        em = em / np.linalg.norm(em, axis=-1, keepdims=True)
        em = jnp.asarray(em * rng.uniform(0.01, 3.1, size=(64, 1)))
        np.testing.assert_allclose(ops.quat_to_exp_map(ops.exp_map_to_quat(em)), em, atol=1e-4)

    def test_exp_map_zero(self):
        q = ops.exp_map_to_quat(jnp.zeros((4, 3)))
        np.testing.assert_allclose(q, ops.quat_identity((4,)), atol=1e-6)
        em = ops.quat_to_exp_map(ops.quat_identity((4,)))
        np.testing.assert_allclose(em, jnp.zeros((4, 3)), atol=1e-6)

    def test_grad_safe_at_zero(self):
        g = jax.grad(lambda e: jnp.sum(ops.exp_map_to_quat(e)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))


class TestTanNorm:
    def test_tan_norm_columns(self, rng):
        q = random_quats(rng)
        tn = ops.quat_to_tan_norm(q)
        m = np_quat_to_mat(np.asarray(q))
        np.testing.assert_allclose(tn[..., 0:3], m[..., :, 0], atol=1e-5)  # rotated +x
        np.testing.assert_allclose(tn[..., 3:6], m[..., :, 2], atol=1e-5)  # rotated +z

    def test_tan_norm_roundtrip(self, rng):
        q = ops.quat_positive(random_quats(rng))
        q2 = ops.tan_norm_to_quat(ops.quat_to_tan_norm(q))
        np.testing.assert_allclose(q2, q, atol=1e-4)


class TestMatrix:
    def test_matrix_roundtrip(self, rng):
        q = ops.quat_positive(random_quats(rng))
        np.testing.assert_allclose(ops.matrix_to_quat(ops.quat_to_matrix(q)), q, atol=1e-5)

    def test_matrix_roundtrip_near_pi(self):
        # exercise all Shepperd pivots: rotations by ~pi about each axis
        axes = jnp.eye(3)
        q = ops.quat_from_angle_axis(jnp.full((3,), np.pi - 1e-3), axes)
        q = ops.quat_positive(q)
        np.testing.assert_allclose(ops.matrix_to_quat(ops.quat_to_matrix(q)), q, atol=1e-5)


class TestSlerpHeading:
    def test_slerp_endpoints(self, rng):
        q0, q1 = random_quats(rng), random_quats(rng)
        np.testing.assert_allclose(ops.slerp(q0, q1, jnp.zeros(64)), q0, atol=1e-5)
        s1 = ops.slerp(q0, q1, jnp.ones(64))
        # t=1 may return sign-flipped q1 (shortest path)
        dot = np.abs(np.sum(np.asarray(s1) * np.asarray(q1), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_slerp_halfway_angle(self):
        axis = jnp.asarray([[0.0, 0.0, 1.0]])
        q0 = ops.quat_from_angle_axis(jnp.zeros(1), axis)
        q1 = ops.quat_from_angle_axis(jnp.asarray([1.0]), axis)
        mid = ops.slerp(q0, q1, jnp.asarray([0.5]))
        np.testing.assert_allclose(ops.quat_angle(mid), 0.5, atol=1e-5)

    def test_heading_of_yaw(self):
        yaw = jnp.asarray([0.3, -1.2, 2.9])
        axis = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (3, 1))
        q = ops.quat_from_angle_axis(yaw, axis)
        np.testing.assert_allclose(ops.calc_heading(q), yaw, atol=1e-5)

    def test_heading_quat_inv_removes_heading(self, rng):
        q = random_quats(rng)
        hq_inv = ops.calc_heading_quat_inv(q)
        residual = ops.quat_mul(hq_inv, q)
        np.testing.assert_allclose(ops.calc_heading(residual), np.zeros(64), atol=1e-4)

    def test_heading_quat_mul_inv_identity(self, rng):
        q = random_quats(rng)
        prod = ops.quat_mul(ops.calc_heading_quat(q), ops.calc_heading_quat_inv(q))
        np.testing.assert_allclose(ops.quat_positive(prod), ops.quat_identity((64,)), atol=1e-5)


class TestTransforms:
    def test_mul_apply_consistent(self, rng):
        ra, rb = random_quats(rng, (32,)), random_quats(rng, (32,))
        ta, tb = (jnp.asarray(rng.normal(size=(32, 3))) for _ in range(2))
        a = ops.transform_from_rotation_translation(ra, ta)
        b = ops.transform_from_rotation_translation(rb, tb)
        v = jnp.asarray(rng.normal(size=(32, 3)))
        np.testing.assert_allclose(
            ops.transform_apply(ops.transform_mul(a, b), v),
            ops.transform_apply(a, ops.transform_apply(b, v)),
            atol=1e-5,
        )

    def test_inverse(self, rng):
        r = random_quats(rng, (32,))
        t = jnp.asarray(rng.normal(size=(32, 3)))
        x = ops.transform_from_rotation_translation(r, t)
        prod = ops.transform_mul(x, ops.transform_inverse(x))
        np.testing.assert_allclose(ops.transform_translation(prod), np.zeros((32, 3)), atol=1e-5)
        np.testing.assert_allclose(
            ops.quat_positive(ops.transform_rotation(prod)), ops.quat_identity((32,)), atol=1e-5
        )


class TestEulerNormalize:
    def test_normalize_angle(self):
        theta = jnp.asarray([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi + 0.5])
        out = np.asarray(ops.normalize_angle(theta))
        assert np.all(out > -np.pi - 1e-6) and np.all(out <= np.pi + 1e-6)
        np.testing.assert_allclose(np.cos(out), np.cos(np.asarray(theta)), atol=1e-6)
        np.testing.assert_allclose(np.sin(out), np.sin(np.asarray(theta)), atol=1e-6)

    def test_euler_xyz_single_axis(self):
        a = jnp.asarray([0.7])
        zero = jnp.zeros(1)
        qx = ops.quat_from_euler_xyz(a, zero, zero)
        np.testing.assert_allclose(
            qx, ops.quat_from_angle_axis(a, jnp.asarray([[1.0, 0, 0]])), atol=1e-6
        )
        qz = ops.quat_from_euler_xyz(zero, zero, a)
        np.testing.assert_allclose(
            qz, ops.quat_from_angle_axis(a, jnp.asarray([[0.0, 0, 1.0]])), atol=1e-6
        )
