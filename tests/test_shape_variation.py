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
