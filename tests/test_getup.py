"""Getup (fall-recovery curriculum) env tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env.humanoid_im_getup import GetupConfig, HumanoidImGetupEnv
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.5)
    motion = build_motion_data(spec.skeleton, clips)
    return HumanoidImGetupEnv(
        model, motion,
        GetupConfig(
            num_amp_obs_steps=2, num_fall_states=8, fall_settle_steps=10,
            fall_init_prob=0.5, recovery_episode_prob=0.3,
        ),
    )


class TestGetup:
    def test_fall_states_are_low(self, env):
        z = np.asarray(env.fall_states.root_pos[:, 2])
        assert z.shape == (8,)
        assert np.all(z < 0.7)  # crumpled on the ground

    def test_reset_mixes_fall_states(self, env):
        keys = jax.random.split(jax.random.PRNGKey(0), 16)
        state = jax.jit(env.reset)(keys)
        z = np.asarray(state.physics.root_pos[:, 2])
        rc = np.asarray(state.recovery_counter)
        # with fall_init_prob=0.5 some resets should be fall states
        assert (z < 0.6).any()
        assert (rc > 0).any()
        assert np.all(np.isfinite(np.asarray(state.obs)))

    def test_step_with_grace(self, env):
        keys = jax.random.split(jax.random.PRNGKey(1), 4)
        state = jax.jit(env.reset)(keys)
        step = jax.jit(env.step)
        for _ in range(3):
            state = step(state, jnp.zeros((4, env.action_dim)))
        assert np.all(np.isfinite(np.asarray(state.obs)))
        # fall-state envs in their grace window must not early-terminate
        rc = np.asarray(state.recovery_counter)
        term = np.asarray(state.terminate)
        assert not (term & (rc > 3)).any()
