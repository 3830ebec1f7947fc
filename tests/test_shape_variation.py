"""Per-env shape variation: batched models through vmap."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import EnvConfig, HumanoidImEnv
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.shape_variation import vary_model_scales


class TestShapeVariation:
    def test_batched_model_leaves(self):
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        bm = vary_model_scales(model, jax.random.PRNGKey(0), 4)
        assert bm.local_translation.shape == (4, 24, 3)
        assert bm.body_mass.shape == (4, 24)
        # masses scale with s^3: heavier envs are taller (compare bone lengths)
        s = np.linalg.norm(np.asarray(bm.local_translation), axis=-1).sum(-1)
        m = np.asarray(bm.body_mass).sum(-1)
        assert (np.argsort(s) == np.argsort(m)).all()

    def test_env_with_shape_variation(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidImEnv(model, motion, EnvConfig(num_amp_obs_steps=2))
        B = 3
        env.enable_shape_variation(jax.random.PRNGKey(1), B, (0.8, 1.2))
        keys = jax.random.split(jax.random.PRNGKey(2), B)
        state = jax.jit(env.reset)(keys)
        assert np.all(np.isfinite(np.asarray(state.obs)))
        out = jax.jit(env.step)(state, jnp.zeros((B, env.action_dim)))
        assert np.all(np.isfinite(np.asarray(out.obs)))
        assert np.all(np.isfinite(np.asarray(out.reward)))


class TestResampleShapes:
    def _env(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        return spec, HumanoidImEnv(
            model, motion, EnvConfig(num_amp_obs_steps=2, has_shape_obs=True)
        )

    def test_resample_keeps_scale_mode(self):
        _, env = self._env()
        env.enable_shape_variation(jax.random.PRNGKey(1), 3, (0.8, 1.2))
        before = np.asarray(env.batched_model.local_translation)
        env.resample_shapes(jax.random.PRNGKey(2))
        after = np.asarray(env.batched_model.local_translation)
        assert before.shape == after.shape
        assert not np.allclose(before, after)

    def test_resample_keeps_smpl_beta_mode(self, tmp_path):
        """ADVICE r2: a periodic resample must NOT silently revert an
        SMPL-beta env to isotropic-scale mode / zero its beta obs rows."""
        from pulse_tpu.smpl.body_model import load_smpl_model
        from pulse_tpu.smpl.synthetic import write_smpl_pickle

        spec, env = self._env()
        path = tmp_path / "SMPL_NEUTRAL.pkl"
        write_smpl_pickle(str(path), spec.skeleton)
        smpl = load_smpl_model(str(path))
        env.enable_shape_variation(
            jax.random.PRNGKey(1), 3, smpl_model=smpl, beta_std=1.0
        )
        betas_before = np.asarray(env._shape_obs_table[:, 1:11])
        assert np.abs(betas_before).max() > 0  # beta rows populated
        env.resample_shapes(jax.random.PRNGKey(2))
        betas_after = np.asarray(env._shape_obs_table[:, 1:11])
        # still in beta mode: rows nonzero and redrawn
        assert np.abs(betas_after).max() > 0
        assert not np.allclose(betas_before, betas_after)

    def test_resample_before_enable_raises(self):
        _, env = self._env()
        with pytest.raises(RuntimeError):
            env.resample_shapes(jax.random.PRNGKey(0))
