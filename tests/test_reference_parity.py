"""Golden parity tests against the LIVE reference code.

Round 1 transcribed the reference's @torch.jit.script obs/reward/rotation
kernels into jnp by hand; these tests actually run the reference torch code
(via tests/reference_shim.py) on random inputs and compare. One silent
sign/axis/order mismatch here would poison checkpoint parity forever, so
this is the ground-truth layer for everything in ops/quat.py and
env/kernels.py.

Grounding: the shim's isaacgym stubs are first validated against
scipy.spatial.transform.Rotation (xyzw, like Isaac Gym) — so the chain is
scipy -> isaacgym stubs -> phc torch_utils -> env kernels -> our jnp code.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp
from scipy.spatial.transform import Rotation as sRot

import reference_shim as rs
from pulse_tpu.env import kernels as K
from pulse_tpu.ops import quat as q

ATOL = 2e-5


@pytest.fixture(scope="module")
def ref_tu():
    return rs.load_ref_torch_utils()


def rand_quats(rng, *shape):
    """Random unit quaternions, xyzw, as float32."""
    flat = int(np.prod(shape)) if shape else 1
    qs = sRot.random(flat, random_state=rng).as_quat().astype(np.float32)
    return qs.reshape(*shape, 4)


def t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def j(x):
    return jnp.asarray(x)


# --------------------------------------------------------------------------- #
# layer 0: the isaacgym stubs themselves vs scipy
# --------------------------------------------------------------------------- #

class TestStubVsScipy:
    def test_quat_mul(self):
        rng = np.random.RandomState(0)
        a, b = rand_quats(rng, 64), rand_quats(rng, 64)
        got = rs.quat_mul(t(a), t(b)).numpy()
        want = (sRot.from_quat(a) * sRot.from_quat(b)).as_quat().astype(np.float32)
        # quats are double-cover: fix sign per row
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-6)

    def test_quat_rotate(self):
        rng = np.random.RandomState(1)
        qs = rand_quats(rng, 64)
        v = rng.randn(64, 3).astype(np.float32)
        got = rs.quat_rotate(t(qs), t(v)).numpy()
        want = sRot.from_quat(qs).apply(v).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=1e-5)
        got2 = rs.quat_apply(t(qs), t(v)).numpy()
        np.testing.assert_allclose(got2, want, atol=1e-5)

    def test_quat_from_angle_axis(self):
        rng = np.random.RandomState(2)
        angle = rng.uniform(-np.pi, np.pi, 64).astype(np.float32)
        axis = rng.randn(64, 3).astype(np.float32)
        got = rs.quat_from_angle_axis(t(angle), t(axis)).numpy()
        rv = axis / np.linalg.norm(axis, axis=-1, keepdims=True) * angle[:, None]
        want = sRot.from_rotvec(rv).as_quat().astype(np.float32)
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-6)

    def test_quat_from_euler_xyz(self):
        rng = np.random.RandomState(3)
        rpy = rng.uniform(-np.pi, np.pi, (64, 3)).astype(np.float32)
        got = rs.quat_from_euler_xyz(t(rpy[:, 0]), t(rpy[:, 1]), t(rpy[:, 2])).numpy()
        # isaacgym's euler convention: extrinsic xyz
        want = sRot.from_euler("xyz", rpy).as_quat().astype(np.float32)
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-6)


# --------------------------------------------------------------------------- #
# layer 1: ops/quat.py vs phc/utils/torch_utils.py
# --------------------------------------------------------------------------- #

class TestQuatOps:
    def test_quat_to_tan_norm(self, ref_tu):
        rng = np.random.RandomState(10)
        qs = rand_quats(rng, 128)
        want = ref_tu.quat_to_tan_norm(t(qs)).numpy()
        got = np.asarray(q.quat_to_tan_norm(j(qs)))
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_quat_to_exp_map(self, ref_tu):
        rng = np.random.RandomState(11)
        qs = rand_quats(rng, 128)
        want = ref_tu.quat_to_exp_map(t(qs)).numpy()
        got = np.asarray(q.quat_to_exp_map(j(qs)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_exp_map_to_quat(self, ref_tu):
        rng = np.random.RandomState(12)
        em = rng.uniform(-2.5, 2.5, (128, 3)).astype(np.float32)
        want = ref_tu.exp_map_to_quat(t(em)).numpy()
        got = np.asarray(q.exp_map_to_quat(j(em)))
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=ATOL)

    def test_quat_to_angle_axis(self, ref_tu):
        rng = np.random.RandomState(13)
        qs = rand_quats(rng, 128)
        want_angle, want_axis = ref_tu.quat_to_angle_axis(t(qs))
        got_angle, got_axis = q.quat_to_angle_axis(j(qs))
        np.testing.assert_allclose(np.asarray(got_angle), want_angle.numpy(), atol=1e-4)
        # axis only meaningful away from identity
        m = np.abs(want_angle.numpy()) > 1e-3
        np.testing.assert_allclose(
            np.asarray(got_axis)[m], want_axis.numpy()[m], atol=1e-3
        )

    def test_calc_heading(self, ref_tu):
        rng = np.random.RandomState(14)
        qs = rand_quats(rng, 128)
        np.testing.assert_allclose(
            np.asarray(q.calc_heading(j(qs))), ref_tu.calc_heading(t(qs)).numpy(),
            atol=ATOL,
        )
        for ours, theirs in [
            (q.calc_heading_quat, ref_tu.calc_heading_quat),
            (q.calc_heading_quat_inv, ref_tu.calc_heading_quat_inv),
        ]:
            got = np.asarray(ours(j(qs)))
            want = theirs(t(qs)).numpy()
            sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
            np.testing.assert_allclose(got * sign, want, atol=ATOL)

    def test_slerp(self, ref_tu):
        rng = np.random.RandomState(15)
        q0, q1 = rand_quats(rng, 128), rand_quats(rng, 128)
        tt = rng.uniform(0, 1, (128,)).astype(np.float32)
        want = ref_tu.slerp(t(q0), t(q1), t(tt[:, None])).numpy()
        got = np.asarray(q.slerp(j(q0), j(q1), j(tt)))
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-4)

    def test_quat_rotate(self, ref_tu):
        rng = np.random.RandomState(16)
        qs = rand_quats(rng, 128)
        v = rng.randn(128, 3).astype(np.float32)
        want = ref_tu.my_quat_rotate(t(qs), t(v)).numpy()
        got = np.asarray(q.quat_rotate(j(qs), j(v)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_tan_norm_to_quat(self, ref_tu):
        rng = np.random.RandomState(17)
        qs = rand_quats(rng, 64)
        tn = ref_tu.quat_to_tan_norm(t(qs))
        want = ref_tu.tan_norm_to_quat(tn).numpy().reshape(-1, 4)
        got = np.asarray(q.tan_norm_to_quat(j(tn.numpy())))
        sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
        np.testing.assert_allclose(got * sign, want, atol=1e-4)


# --------------------------------------------------------------------------- #
# layer 2: env kernels vs the reference's @torch.jit.script functions
# --------------------------------------------------------------------------- #

B, J, T, D, KB = 13, 24, 3, 69, 4


def _rand_body_state(rng):
    return (
        rng.randn(B, J, 3).astype(np.float32) + np.array([0, 0, 1], np.float32),
        rand_quats(rng, B, J),
        rng.randn(B, J, 3).astype(np.float32),
        rng.randn(B, J, 3).astype(np.float32),
    )


class TestEnvKernels:
    def test_dof_to_obs_smpl(self):
        ks = rs.extract_kernels("phc/env/tasks/humanoid.py", ["dof_to_obs_smpl"])
        rng = np.random.RandomState(20)
        pose = rng.uniform(-2, 2, (B, D)).astype(np.float32)
        want = ks["dof_to_obs_smpl"](t(pose)).numpy()
        got = np.asarray(K.dof_to_obs_smpl(j(pose)))
        np.testing.assert_allclose(got, want, atol=ATOL)

    @pytest.mark.parametrize("local_root_obs", [True, False])
    @pytest.mark.parametrize("root_height_obs", [True, False])
    def test_self_obs_max(self, local_root_obs, root_height_obs):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid.py", ["compute_humanoid_observations_smpl_max"]
        )
        rng = np.random.RandomState(21)
        pos, rot, vel, avel = _rand_body_state(rng)
        empty = torch.zeros(B, 0)
        want = ks["compute_humanoid_observations_smpl_max"](
            t(pos), t(rot), t(vel), t(avel), empty, empty,
            local_root_obs, root_height_obs, True, False, False,
        ).numpy()
        got = np.asarray(
            K.compute_humanoid_self_obs_max(
                j(pos), j(rot), j(vel), j(avel),
                local_root_obs=local_root_obs, root_height_obs=root_height_obs,
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=ATOL)

    def test_imitation_observations_v6(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_imitation_observations_v6"]
        )
        rng = np.random.RandomState(22)
        pos, rot, vel, avel = _rand_body_state(rng)
        ref_pos = rng.randn(B, T, J, 3).astype(np.float32)
        ref_rot = rand_quats(rng, B, T, J)
        ref_vel = rng.randn(B, T, J, 3).astype(np.float32)
        ref_avel = rng.randn(B, T, J, 3).astype(np.float32)
        want = ks["compute_imitation_observations_v6"](
            t(pos[:, 0]), t(rot[:, 0]), t(pos), t(rot), t(vel), t(avel),
            # reference passes refs flattened as [B, T*J, .]
            t(ref_pos.reshape(B, T * J, 3)), t(ref_rot.reshape(B, T * J, 4)),
            t(ref_vel.reshape(B, T * J, 3)), t(ref_avel.reshape(B, T * J, 3)),
            T, True,
        ).numpy()
        got = np.asarray(
            K.compute_imitation_observations_v6(
                j(pos[:, 0]), j(rot[:, 0]), j(pos), j(rot), j(vel), j(avel),
                j(ref_pos), j(ref_rot), j(ref_vel), j(ref_avel),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_imitation_reward(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_imitation_reward"]
        )
        rng = np.random.RandomState(23)
        pos, rot, vel, avel = _rand_body_state(rng)
        # refs near the sim state so rewards aren't all ~0
        ref_pos = pos + 0.05 * rng.randn(B, J, 3).astype(np.float32)
        ref_rot = rand_quats(rng, B, J)
        ref_vel = vel + 0.3 * rng.randn(B, J, 3).astype(np.float32)
        ref_avel = avel + 0.3 * rng.randn(B, J, 3).astype(np.float32)
        specs = {
            "k_pos": 100.0, "k_rot": 10.0, "k_vel": 0.1, "k_ang_vel": 0.1,
            "w_pos": 0.5, "w_rot": 0.3, "w_vel": 0.1, "w_ang_vel": 0.1,
        }
        want_r, want_raw = ks["compute_imitation_reward"](
            t(pos[:, 0]), t(rot[:, 0]), t(pos), t(rot), t(vel), t(avel),
            t(ref_pos), t(ref_rot), t(ref_vel), t(ref_avel), specs,
        )
        got_r, got_raw = K.compute_imitation_reward(
            j(pos), j(rot), j(vel), j(avel),
            j(ref_pos), j(ref_rot), j(ref_vel), j(ref_avel),
        )
        np.testing.assert_allclose(np.asarray(got_raw), want_raw.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-4)

    @pytest.mark.parametrize("use_mean", [True, False])
    def test_humanoid_im_reset(self, use_mean):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_humanoid_im_reset"]
        )
        rng = np.random.RandomState(24)
        pos = rng.randn(B, J, 3).astype(np.float32)
        ref_pos = pos + (rng.rand(B, J, 3).astype(np.float32) - 0.3)
        progress = rng.randint(0, 300, B)
        pass_time = progress > 250
        td = 0.25
        want_reset, want_term = ks["compute_humanoid_im_reset"](
            torch.zeros(B, dtype=torch.long), t(progress),
            torch.zeros(B, J, 3), torch.arange(2), t(pos), t(ref_pos),
            t(pass_time), True, torch.full((J,), td), False, use_mean,
        )
        got_reset, got_term = K.compute_humanoid_im_reset(
            j(progress), j(pos), j(ref_pos), j(pass_time),
            termination_distance=td, use_mean=use_mean,
        )
        np.testing.assert_array_equal(
            np.asarray(got_term).astype(bool), want_term.numpy().astype(bool)
        )
        np.testing.assert_array_equal(
            np.asarray(got_reset).astype(bool), want_reset.numpy().astype(bool)
        )

    @pytest.mark.parametrize("local_root_obs", [True, False])
    def test_build_amp_observations_smpl(self, local_root_obs):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_amp.py", ["build_amp_observations_smpl"]
        )
        rng = np.random.RandomState(25)
        root_pos = rng.randn(B, 3).astype(np.float32)
        root_rot = rand_quats(rng, B)
        root_vel = rng.randn(B, 3).astype(np.float32)
        root_avel = rng.randn(B, 3).astype(np.float32)
        dof_pos = rng.uniform(-2, 2, (B, D)).astype(np.float32)
        dof_vel = rng.randn(B, D).astype(np.float32)
        key_pos = rng.randn(B, KB, 3).astype(np.float32)
        empty = torch.zeros(B, 0)
        want = ks["build_amp_observations_smpl"](
            t(root_pos), t(root_rot), t(root_vel), t(root_avel),
            t(dof_pos), t(dof_vel), t(key_pos), empty, empty,
            torch.arange(D), local_root_obs, True, False, False, False, True,
        ).numpy()
        got = np.asarray(
            K.build_amp_observations_smpl(
                j(root_pos), j(root_rot), j(root_vel), j(root_avel),
                j(dof_pos), j(dof_vel), j(key_pos),
                local_root_obs=local_root_obs, root_height_obs=True,
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=ATOL)

    @pytest.mark.parametrize("shape_channels", [False, True])
    def test_build_amp_observations_smpl_v2(self, shape_channels):
        """≙ humanoid_amp.py:973-1017: v1 + heading-local key-body
        velocities (+ shape/limb trailing channels when flagged)."""
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_amp.py", ["build_amp_observations_smpl_v2"]
        )
        rng = np.random.RandomState(26)
        root_pos = rng.randn(B, 3).astype(np.float32)
        root_rot = rand_quats(rng, B)
        root_vel = rng.randn(B, 3).astype(np.float32)
        root_avel = rng.randn(B, 3).astype(np.float32)
        dof_pos = rng.uniform(-2, 2, (B, D)).astype(np.float32)
        dof_vel = rng.randn(B, D).astype(np.float32)
        key_pos = rng.randn(B, KB, 3).astype(np.float32)
        key_vel = rng.randn(B, KB, 3).astype(np.float32)
        if shape_channels:
            shape_p = rng.randn(B, 11).astype(np.float32)
            limb_p = rng.randn(B, 10).astype(np.float32)
            t_shape, t_limb = t(shape_p), t(limb_p)
            j_shape, j_limb = j(shape_p), j(limb_p)
        else:
            t_shape = t_limb = torch.zeros(B, 0)
            j_shape = j_limb = None
        want = ks["build_amp_observations_smpl_v2"](
            t(root_pos), t(root_rot), t(root_vel), t(root_avel),
            t(dof_pos), t(dof_vel), t(key_pos), t(key_vel), t_shape, t_limb,
            torch.arange(D), True, True, False, shape_channels,
            shape_channels, True,
        ).numpy()
        got = np.asarray(
            K.build_amp_observations_smpl_v2(
                j(root_pos), j(root_rot), j(root_vel), j(root_avel),
                j(dof_pos), j(dof_vel), j(key_pos), j(key_vel),
                local_root_obs=True, root_height_obs=True,
                shape_params=j_shape, limb_weight_params=j_limb,
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=ATOL)


# --------------------------------------------------------------------------- #
# layer 3: kinematics vs live poselib
# --------------------------------------------------------------------------- #

class TestPoselibParity:
    @pytest.fixture(scope="class")
    def tree(self):
        from pulse_tpu.assets import load_smpl_humanoid

        return load_smpl_humanoid().skeleton

    @pytest.fixture(scope="class")
    def ptree(self, tree):
        rs.install()
        from poselib.poselib.skeleton.skeleton3d import SkeletonTree as PTree

        return PTree(
            list(tree.node_names),
            torch.from_numpy(np.asarray(tree.parent_indices)).long(),
            torch.from_numpy(np.asarray(tree.local_translation)).float(),
        )

    def test_fk(self, tree, ptree):
        from poselib.poselib.skeleton.skeleton3d import SkeletonState
        from pulse_tpu.kinematics.skeleton import forward_kinematics

        rng = np.random.RandomState(30)
        Tn, Jn = 5, tree.num_joints
        local_rot = rand_quats(rng, Tn, Jn)
        root_t = rng.randn(Tn, 3).astype(np.float32)
        st = SkeletonState.from_rotation_and_root_translation(
            ptree, torch.from_numpy(local_rot), torch.from_numpy(root_t), is_local=True
        )
        want_rot = st.global_rotation.numpy()
        want_pos = st.global_translation.numpy()
        got_rot, got_pos = forward_kinematics(tree, j(local_rot), j(root_t))
        got_rot, got_pos = np.asarray(got_rot), np.asarray(got_pos)
        sign = np.sign(np.sum(got_rot * want_rot, axis=-1, keepdims=True))
        np.testing.assert_allclose(got_rot * sign, want_rot, atol=1e-5)
        np.testing.assert_allclose(got_pos, want_pos, atol=1e-5)

    def test_global_to_local(self, tree, ptree):
        from poselib.poselib.skeleton.skeleton3d import SkeletonState
        from pulse_tpu.kinematics.skeleton import forward_kinematics, global_to_local

        rng = np.random.RandomState(31)
        local_rot = rand_quats(rng, 4, tree.num_joints)
        root_t = rng.randn(4, 3).astype(np.float32)
        g_rot, _ = forward_kinematics(tree, j(local_rot), j(root_t))
        back = np.asarray(global_to_local(tree, g_rot))
        sign = np.sign(np.sum(back * local_rot, axis=-1, keepdims=True))
        np.testing.assert_allclose(back * sign, local_rot, atol=1e-5)

    @pytest.mark.parametrize("smooth", [False, True])
    def test_velocities(self, smooth):
        rs.install()
        from poselib.poselib.skeleton.skeleton3d import SkeletonMotion
        from pulse_tpu.kinematics.skeleton import (
            compute_angular_velocity,
            compute_linear_velocity,
        )

        rng = np.random.RandomState(32)
        Tn, Jn, fps = 20, 6, 30.0
        pos = np.cumsum(0.02 * rng.randn(Tn, Jn, 3), axis=0).astype(np.float32)
        want_v = SkeletonMotion._compute_velocity(
            torch.from_numpy(pos), 1.0 / fps, guassian_filter=smooth
        ).numpy()
        got_v = np.asarray(compute_linear_velocity(j(pos), fps, smooth=smooth))
        np.testing.assert_allclose(got_v, want_v, atol=1e-4)

        rot = rand_quats(rng, Tn, Jn)
        want_av = SkeletonMotion._compute_angular_velocity(
            torch.from_numpy(rot), 1.0 / fps, guassian_filter=smooth
        ).numpy()
        got_av = np.asarray(compute_angular_velocity(j(rot), fps, smooth=smooth))
        np.testing.assert_allclose(got_av, want_av, atol=2e-3)


class TestImObsVariants:
    """obs v7/v8/v9 (humanoid_im.py:1382-1540) — round 2 extends the golden
    net beyond v6."""

    def _inputs(self, seed):
        rng = np.random.RandomState(seed)
        pos, rot, vel, avel = _rand_body_state(rng)
        return (
            pos, rot, vel, avel,
            rng.randn(B, T, J, 3).astype(np.float32),
            rand_quats(rng, B, T, J),
            rng.randn(B, T, J, 3).astype(np.float32),
            rng.randn(B, T, J, 3).astype(np.float32),
        )

    def test_v7(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_imitation_observations_v7"]
        )
        pos, rot, vel, avel, rp, rr, rv, rav = self._inputs(40)
        want = ks["compute_imitation_observations_v7"](
            t(pos[:, 0]), t(rot[:, 0]), t(pos), t(vel),
            t(rp.reshape(B, T * J, 3)), t(rv.reshape(B, T * J, 3)), T, True,
        ).numpy()
        got = np.asarray(
            K.compute_imitation_observations_v7(
                j(pos[:, 0]), j(rot[:, 0]), j(pos), j(vel), j(rp), j(rv)
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_v8(self):
        # time_steps == 1 only: the reference's T>1 branch CRASHES in torch
        # (`local_ref_body_vel[:, 1:].view(...)` on a non-contiguous slice,
        # humanoid_im.py:1474) — our kernel implements the natural extension
        # for T>1 and matches the working T=1 branch exactly.
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_imitation_observations_v8"]
        )
        pos, rot, vel, avel, rp, rr, rv, rav = self._inputs(41)
        rp, rr, rv, rav = rp[:, :1], rr[:, :1], rv[:, :1], rav[:, :1]
        want = ks["compute_imitation_observations_v8"](
            t(pos[:, 0]), t(rot[:, 0]), t(pos), t(rot), t(vel), t(avel),
            t(rp.reshape(B, J, 3)), t(rr.reshape(B, J, 4)),
            t(rv.reshape(B, J, 3)), t(rav.reshape(B, J, 3)), 1, True,
        ).numpy()
        got = np.asarray(
            K.compute_imitation_observations_v8(
                j(pos[:, 0]), j(rot[:, 0]), j(pos), j(rot), j(vel), j(avel),
                j(rp), j(rr), j(rv), j(rav),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_v9(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_im.py", ["compute_imitation_observations_v9"]
        )
        rng = np.random.RandomState(42)
        pos, rot, vel, avel = _rand_body_state(rng)
        rp = rng.randn(B, T, J, 3).astype(np.float32)
        rr = rand_quats(rng, B, T, J)
        rrv = rng.randn(B, T, 3).astype(np.float32)
        rrav = rng.randn(B, T, 3).astype(np.float32)
        want = ks["compute_imitation_observations_v9"](
            t(pos[:, 0]), t(rot[:, 0]), t(pos), t(rot), t(vel), t(avel),
            t(rp.reshape(B, T * J, 3)), t(rr.reshape(B, T * J, 4)),
            t(rrv), t(rrav), T, True,
        ).numpy()
        got = np.asarray(
            K.compute_imitation_observations_v9(
                j(pos[:, 0]), j(rot[:, 0]), j(pos), j(rot), j(vel), j(avel),
                j(rp), j(rr), j(rrv), j(rrav),
            )
        )
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestTaskKernels:
    """Downstream-task obs/reward kernels vs the reference
    (humanoid_speed.py:311-344, humanoid_traj.py:234-266). Our envs inline
    these expressions (humanoid_task.py) — the test pins the exact math."""

    def test_speed(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_speed.py",
            ["compute_speed_observations", "compute_speed_reward"],
        )
        rng = np.random.RandomState(50)
        root_states = rng.randn(B, 13).astype(np.float32)
        root_states[:, 3:7] = rand_quats(rng, B)
        tar_speed = rng.uniform(0, 5, B).astype(np.float32)
        want = ks["compute_speed_observations"](t(root_states), t(tar_speed)).numpy()
        # ours (humanoid_task.py HumanoidSpeedEnv._task_obs)
        heading_inv = q.calc_heading_quat_inv(j(root_states[:, 3:7]))
        tar_dir = q.quat_rotate(heading_inv, jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (B, 3)))
        got = np.asarray(jnp.concatenate([tar_dir[:, 0:2], j(tar_speed)[:, None]], -1))
        np.testing.assert_allclose(got, want, atol=1e-5)

        pos = rng.randn(B, 3).astype(np.float32)
        prev = pos - 0.03 * rng.randn(B, 3).astype(np.float32)
        dt = 1.0 / 30.0
        want_r = ks["compute_speed_reward"](
            t(pos), t(prev), t(root_states[:, 3:7]), t(tar_speed), dt
        ).numpy()
        root_vel = (j(pos) - j(prev)) / dt
        got_r = np.asarray(
            jnp.exp(-0.25 * ((j(tar_speed) - root_vel[:, 0]) ** 2 + 0.1 * root_vel[:, 1] ** 2))
        )
        np.testing.assert_allclose(got_r, want_r, atol=1e-5)

    def test_location(self):
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_traj.py",
            ["compute_location_observations", "compute_location_reward"],
        )
        rng = np.random.RandomState(51)
        root_states = rng.randn(B, 13).astype(np.float32)
        root_states[:, 3:7] = rand_quats(rng, B)
        S = 10
        samples = rng.randn(B, S, 3).astype(np.float32)
        want = ks["compute_location_observations"](t(root_states), t(samples)).numpy()
        # ours (humanoid_task.py HumanoidTrajEnv._task_obs, batched form)
        heading_inv = q.calc_heading_quat_inv(j(root_states[:, 3:7]))
        delta = j(samples) - j(root_states[:, None, 0:3])
        local = q.quat_rotate(heading_inv[:, None], delta)
        got = np.asarray(local[..., 0:2].reshape(B, -1))
        np.testing.assert_allclose(got, want, atol=1e-5)

        tar = rng.randn(B, 3).astype(np.float32)
        want_r = ks["compute_location_reward"](t(root_states[:, 0:3]), t(tar)).numpy()
        d = j(tar)[:, 0:2] - j(root_states[:, 0:2])
        got_r = np.asarray(jnp.exp(-2.0 * jnp.sum(d * d, -1)))
        np.testing.assert_allclose(got_r, want_r, atol=1e-5)

    def test_reach(self):
        """≙ humanoid_reach.py:224-247 (obs + reward; ours inlined in
        HumanoidReachEnv._task_obs/_task_reward)."""
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_reach.py",
            ["compute_location_observations", "compute_reach_reward"],
        )
        rng = np.random.RandomState(52)
        root_states = rng.randn(B, 13).astype(np.float32)
        root_states[:, 3:7] = rand_quats(rng, B)
        tar = rng.randn(B, 3).astype(np.float32)
        want = ks["compute_location_observations"](t(root_states), t(tar)).numpy()
        heading_inv = q.calc_heading_quat_inv(j(root_states[:, 3:7]))
        got = np.asarray(
            q.quat_rotate(heading_inv, j(tar) - j(root_states[:, 0:3]))
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

        body_pos = rng.randn(B, 3).astype(np.float32)
        want_r = ks["compute_reach_reward"](
            t(body_pos), t(root_states[:, 3:7]), t(tar), 1.0, 1.0 / 30.0
        ).numpy()
        err = jnp.sum((j(tar) - j(body_pos)) ** 2, -1)
        got_r = np.asarray(jnp.exp(-4.0 * err))
        np.testing.assert_allclose(got_r, want_r, atol=1e-5)

    def test_strike(self):
        """≙ humanoid_strike.py:270-328 (obs + reward; ours inlined in
        HumanoidStrikeEnv._task_obs/_task_reward)."""
        ks = rs.extract_kernels(
            "phc/env/tasks/humanoid_strike.py",
            ["compute_strike_observations", "compute_strike_reward"],
        )
        rng = np.random.RandomState(53)
        root_states = rng.randn(B, 13).astype(np.float32)
        root_states[:, 3:7] = rand_quats(rng, B)
        tar_states = rng.randn(B, 13).astype(np.float32)
        tar_states[:, 3:7] = rand_quats(rng, B)
        want = ks["compute_strike_observations"](t(root_states), t(tar_states)).numpy()
        heading_inv = q.calc_heading_quat_inv(j(root_states[:, 3:7]))
        local_pos = j(tar_states[:, 0:3]) - j(root_states[:, 0:3])
        local_pos = local_pos.at[:, 2].set(j(tar_states[:, 2]))
        got = np.asarray(
            jnp.concatenate(
                [
                    q.quat_rotate(heading_inv, local_pos),
                    q.quat_to_tan_norm(
                        q.quat_mul(heading_inv, j(tar_states[:, 3:7]))
                    ),
                    q.quat_rotate(heading_inv, j(tar_states[:, 7:10])),
                    q.quat_rotate(heading_inv, j(tar_states[:, 10:13])),
                ],
                axis=-1,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

        prev_root_pos = root_states[:, 0:3] - 0.03 * rng.randn(B, 3).astype(
            np.float32
        )
        strike_body_vel = rng.randn(B, 3).astype(np.float32)
        dt = 1.0 / 30.0
        want_r = ks["compute_strike_reward"](
            t(tar_states[:, 0:3]), t(tar_states[:, 3:7]), t(root_states),
            t(prev_root_pos), t(strike_body_vel), dt, 1.5,
        ).numpy()
        # ours (humanoid_strike.py _task_reward, batched form)
        up = jnp.asarray([0.0, 0.0, 1.0])
        tar_up = q.quat_rotate(j(tar_states[:, 3:7]), jnp.broadcast_to(up, (B, 3)))
        tar_rot_err = tar_up[:, 2]
        tar_rot_r = jnp.maximum(1.0 - tar_rot_err, 0.0)
        tar_dir = j(tar_states[:, 0:2]) - j(root_states[:, 0:2])
        tar_dir = tar_dir / jnp.maximum(
            jnp.linalg.norm(tar_dir, axis=-1, keepdims=True), 1e-6
        )
        root_vel = (j(root_states[:, 0:3]) - j(prev_root_pos)) / dt
        tar_dir_speed = jnp.sum(tar_dir * root_vel[:, 0:2], -1)
        vel_err = jnp.maximum(1.0 - tar_dir_speed, 0.0)
        vel_r = jnp.where(
            tar_dir_speed <= 0, 0.0, jnp.exp(-4.0 * vel_err * vel_err)
        )
        got_r = np.asarray(
            jnp.where(tar_rot_err < 0.2, 1.0, 0.6 * tar_rot_r + 0.4 * vel_r)
        )
        np.testing.assert_allclose(got_r, want_r, atol=1e-5)
