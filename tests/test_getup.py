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


class TestAMPGetup:
    """≙ phc/env/tasks/humanoid_amp_getup.py: pure-AMP env + getup."""

    def test_amp_getup_env(self):
        from pulse_tpu.env.humanoid_amp_getup import HumanoidAMPGetupEnv
        from pulse_tpu.env.humanoid_im_getup import GetupConfig

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidAMPGetupEnv(
            model, motion,
            GetupConfig(episode_length=15, num_fall_states=4, fall_settle_steps=3,
                        fall_init_prob=0.5),
        )
        # no task obs: policy sees self obs only, but AMP obs still flow
        assert env.task_obs_dim == 0
        assert env.obs_dim == env.self_obs_dim
        assert env.amp_obs_dim > 0
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        state = jax.jit(env.reset)(keys)
        assert state.obs.shape == (4, env.self_obs_dim)
        step = jax.jit(env.step)
        for _ in range(3):
            a = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, env.action_dim))
            state = step(state, a)
        # constant task reward (style comes from the discriminator)
        np.testing.assert_allclose(np.asarray(state.reward), 1.0)
        assert bool(jnp.all(jnp.isfinite(state.obs)))
        assert state.amp_obs.shape == (4, env.amp_obs_dim)

    def test_amp_getup_cfg_builds(self):
        from pulse_tpu.utils.config import load_config
        from pulse_tpu import run as run_mod

        cfg = load_config(["env=amp_getup", "num_envs=2",
                           "env.num_fall_states=4", "env.fall_settle_steps=2"])
        spec, model = run_mod.build_model_from_cfg(cfg)
        motion = run_mod.build_motion_from_cfg(cfg, spec)
        env = run_mod.build_env_from_cfg(cfg, model, motion)
        assert env.task_obs_dim == 0
