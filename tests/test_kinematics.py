"""FK / skeleton tests (≙ poselib skeleton tests,
poselib/poselib/skeleton/tests/test_skeleton.py — but automated)."""

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu import ops
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.kinematics import (
    SkeletonTree,
    forward_kinematics,
    global_to_local,
    compute_angular_velocity,
    compute_linear_velocity,
)


def chain_tree():
    # 4-link chain along +x
    return SkeletonTree(
        ("a", "b", "c", "d"),
        np.asarray([-1, 0, 1, 2]),
        np.asarray([[0, 0, 0], [1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32),
    )


class TestFK:
    def test_identity_pose_positions(self):
        tree = chain_tree()
        lr = ops.quat_identity((4,))
        root_t = jnp.zeros(3)
        g_rot, g_pos = forward_kinematics(tree, lr, root_t)
        np.testing.assert_allclose(
            g_pos, [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 0, 0]], atol=1e-6
        )

    def test_bent_chain(self):
        tree = chain_tree()
        # rotate joint b by 90deg about z: c,d fold along +y
        lr = np.tile([0, 0, 0, 1.0], (4, 1))
        lr[1] = np.asarray(
            ops.quat_from_angle_axis(jnp.asarray(np.pi / 2), jnp.asarray([0.0, 0, 1]))
        )
        g_rot, g_pos = forward_kinematics(tree, jnp.asarray(lr), jnp.zeros(3))
        np.testing.assert_allclose(
            g_pos, [[0, 0, 0], [1, 0, 0], [1, 1, 0], [1, 2, 0]], atol=1e-6
        )

    def test_batched_fk_smpl(self, rng):
        spec = load_smpl_humanoid()
        tree = spec.skeleton
        B = 8
        em = rng.normal(size=(B, tree.num_joints, 3)) * 0.3
        lr = ops.exp_map_to_quat(jnp.asarray(em))
        root_t = jnp.asarray(rng.normal(size=(B, 3)))
        g_rot, g_pos = jax.jit(lambda r, t: forward_kinematics(tree, r, t))(lr, root_t)
        assert g_rot.shape == (B, 24, 4)
        assert g_pos.shape == (B, 24, 3)
        # root passthrough
        np.testing.assert_allclose(g_pos[:, 0], root_t, atol=1e-6)
        np.testing.assert_allclose(g_rot[:, 0], lr[:, 0], atol=1e-6)
        # bone lengths preserved
        parents = tree.parent_indices
        for j in range(1, 24):
            bone = np.linalg.norm(tree.local_translation[j])
            got = np.linalg.norm(
                np.asarray(g_pos[:, j]) - np.asarray(g_pos[:, parents[j]]), axis=-1
            )
            np.testing.assert_allclose(got, bone, atol=1e-5)

    def test_local_global_roundtrip(self, rng):
        spec = load_smpl_humanoid()
        tree = spec.skeleton
        em = rng.normal(size=(4, tree.num_joints, 3)) * 0.4
        lr = ops.quat_positive(ops.exp_map_to_quat(jnp.asarray(em)))
        g_rot, _ = forward_kinematics(tree, lr, jnp.zeros((4, 3)))
        lr2 = ops.quat_positive(global_to_local(tree, g_rot))
        np.testing.assert_allclose(lr2, lr, atol=1e-5)


class TestVelocities:
    def test_linear_velocity_constant(self):
        t = np.linspace(0, 1, 31)[:, None, None]
        pos = jnp.asarray(t * np.asarray([1.0, 2.0, 3.0])[None, None, :])
        v = compute_linear_velocity(pos, fps=30.0)
        np.testing.assert_allclose(v[5:-5], np.tile([1.0, 2.0, 3.0], (21, 1, 1)), rtol=1e-3)

    def test_angular_velocity_constant_yaw(self):
        fps, omega = 30.0, 1.5
        T = 40
        angles = jnp.asarray(np.arange(T) * omega / fps)
        axis = jnp.tile(jnp.asarray([0.0, 0, 1.0]), (T, 1))
        rot = ops.quat_from_angle_axis(angles, axis)[:, None, :]
        av = compute_angular_velocity(rot, fps=fps)
        # poselib semantics (matched exactly): forward diff with a ZERO at the
        # final frame, then sigma=2 radius-8 gaussian smoothing — so the last
        # ~10 frames are polluted by the terminal zero, like the reference's.
        np.testing.assert_allclose(
            av[8:-10, 0], np.tile([0, 0, omega], (T - 18, 1)), atol=1e-3
        )


class TestSpec:
    def test_smpl_spec_shapes(self):
        spec = load_smpl_humanoid()
        assert spec.num_bodies == 24
        assert spec.num_joints == 23
        assert spec.num_dof == 69
        assert spec.skeleton.node_names[0] == "Pelvis"
        assert 50 < spec.body_mass.sum() < 100
        assert np.all(spec.body_mass > 0)
        # inertia PSD
        for I in spec.body_inertia:
            assert np.all(np.linalg.eigvalsh(I) > 0)
        # limits sane
        assert np.all(spec.dof_upper >= spec.dof_lower)
        # knees should allow large flexion about y
        knee = spec.skeleton.index("L_Knee") - 1
        assert spec.dof_upper[3 * knee + 1] > 2.0

    def test_levels_cover_all(self):
        tree = load_smpl_humanoid().skeleton
        allv = np.sort(np.concatenate(tree.levels))
        np.testing.assert_array_equal(allv, np.arange(24))
