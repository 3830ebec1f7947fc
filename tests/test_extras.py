"""Tests for obs versions, VQ quantizer, retargeting, heading randomization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu import ops
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import kernels
from pulse_tpu.kinematics import forward_kinematics
from pulse_tpu.kinematics.retarget import retarget_motion
from pulse_tpu.learning.vq_quantizer import (
    CodebookState,
    create_codebook,
    ema_update,
    project_to_norm,
    quantize,
)
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.motion.motion_lib import randomize_clip_heading


class TestObsVersions:
    def _inputs(self, rng, T=2):
        B, J = 3, 24
        mk = lambda *s: jnp.asarray(rng.normal(size=s))
        quat = lambda *s: ops.quat_unit(jnp.asarray(rng.normal(size=s + (4,))))
        return dict(
            root_pos=mk(B, 3), root_rot=quat(B),
            body_pos=mk(B, J, 3), body_rot=quat(B, J),
            body_vel=mk(B, J, 3), body_ang_vel=mk(B, J, 3),
            ref_body_pos=mk(B, T, J, 3), ref_body_rot=quat(B, T, J),
            ref_body_vel=mk(B, T, J, 3), ref_body_ang_vel=mk(B, T, J, 3),
        )

    def test_v6_shape(self, rng):
        x = self._inputs(rng)
        out = kernels.compute_imitation_observations_v6(**x)
        assert out.shape == (3, 2 * 24 * 24)

    def test_v7_shape(self, rng):
        x = self._inputs(rng)
        out = kernels.compute_imitation_observations_v7(
            x["root_pos"], x["root_rot"], x["body_pos"], x["body_vel"],
            x["ref_body_pos"], x["ref_body_vel"],
        )
        assert out.shape == (3, 2 * 24 * 9)

    def test_v8_shape(self, rng):
        x = self._inputs(rng)
        out = kernels.compute_imitation_observations_v8(**x)
        assert out.shape == (3, 24 * 15 + 2 * 24 * 15)

    def test_v9_shape(self, rng):
        x = self._inputs(rng)
        out = kernels.compute_imitation_observations_v9(
            x["root_pos"], x["root_rot"], x["body_pos"], x["body_rot"],
            x["body_vel"], x["body_ang_vel"],
            x["ref_body_pos"], x["ref_body_rot"],
            x["ref_body_vel"][:, :, 0], x["ref_body_ang_vel"][:, :, 0],
        )
        assert out.shape == (3, 2 * (24 * 18 + 6))


class TestVQ:
    def test_quantize_picks_nearest(self):
        cb = CodebookState(
            codebook=jnp.asarray([[0.0, 0.0], [10.0, 10.0]]),
            ema_counts=jnp.ones(2),
            ema_means=jnp.asarray([[0.0, 0.0], [10.0, 10.0]]),
        )
        z = jnp.asarray([[0.5, -0.5], [9.0, 11.0]])
        z_q, idx, losses = quantize(cb, z)
        np.testing.assert_array_equal(idx, [0, 1])
        assert float(losses["commit_loss"]) > 0

    def test_straight_through_gradient(self):
        cb = create_codebook(jax.random.PRNGKey(0), 8, 4)
        g = jax.grad(lambda z: jnp.sum(quantize(cb, z)[0] ** 2))(jnp.ones((2, 4)))
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).sum() > 0

    def test_ema_moves_codebook(self):
        cb = create_codebook(jax.random.PRNGKey(0), 4, 2)
        z = jnp.ones((64, 2)) * 3.0
        _, idx, _ = quantize(cb, z)
        cb2 = ema_update(cb, z, idx, decay=0.5)
        # the winning code should move toward 3.0
        winner = int(np.bincount(np.asarray(idx)).argmax())
        assert float(jnp.linalg.norm(cb2.codebook[winner] - 3.0)) < float(
            jnp.linalg.norm(cb.codebook[winner] - 3.0)
        )

    def test_project_sphere(self):
        x = jnp.asarray([[3.0, 4.0]])
        out = project_to_norm(x, norm=1.0, z_type="sphere")
        np.testing.assert_allclose(jnp.linalg.norm(out), 1.0, atol=1e-5)


class TestRetarget:
    def test_identity_retarget(self):
        tree = load_smpl_humanoid().skeleton
        clips = make_synthetic_clips(tree, num_clips=1, seconds=0.5)
        lr = jnp.asarray(clips[0]["local_rotation"])
        rt = jnp.asarray(clips[0]["root_translation"])
        out_lr, out_rt = retarget_motion(tree, tree, lr, rt)
        np.testing.assert_allclose(out_lr, lr, atol=1e-5)
        np.testing.assert_allclose(out_rt, rt, atol=1e-5)

    def test_scaled_skeleton_scales_root(self):
        tree = load_smpl_humanoid().skeleton
        from pulse_tpu.kinematics.skeleton import SkeletonTree

        big = SkeletonTree(
            tree.node_names, tree.parent_indices, tree.local_translation * 2.0
        )
        clips = make_synthetic_clips(tree, num_clips=1, seconds=0.5)
        lr = jnp.asarray(clips[0]["local_rotation"])
        rt = jnp.asarray(clips[0]["root_translation"])
        _, out_rt = retarget_motion(tree, big, lr, rt)
        np.testing.assert_allclose(out_rt, rt * 2.0, rtol=1e-4)


class TestHeadingRandomization:
    def test_rotates_about_start(self):
        tree = load_smpl_humanoid().skeleton
        clip = make_synthetic_clips(tree, num_clips=1, seconds=1.0)[0]
        out = randomize_clip_heading(clip, np.pi / 2)
        # start position unchanged
        np.testing.assert_allclose(
            out["root_translation"][0], clip["root_translation"][0], atol=1e-5
        )
        # distances from start preserved
        d0 = np.linalg.norm(
            clip["root_translation"][:, :2] - clip["root_translation"][0, :2], axis=-1
        )
        d1 = np.linalg.norm(
            out["root_translation"][:, :2] - out["root_translation"][0, :2], axis=-1
        )
        np.testing.assert_allclose(d1, d0, atol=1e-5)

    def test_build_with_heading_seed(self):
        tree = load_smpl_humanoid().skeleton
        clips = make_synthetic_clips(tree, num_clips=2, seconds=1.0)
        data = build_motion_data(tree, clips, random_heading_seed=3)
        assert np.all(np.isfinite(np.asarray(data.gts)))
