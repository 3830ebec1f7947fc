"""HumanoidIm env tests: shapes, reset consistency, reward sanity,
termination, auto-reset — plus the reference's 'consistency test' pattern
(HACK_CONSISTENCY_TEST, humanoid_amp.py:748-783): teleport the sim to the
reference state and verify kernels see a near-perfect match."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import HumanoidImEnv, EnvConfig
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    tree = spec.skeleton
    clips = make_synthetic_clips(tree, num_clips=2, seconds=2.0)
    motion = build_motion_data(tree, clips)
    return HumanoidImEnv(model, motion, EnvConfig())


class TestReset:
    def test_obs_shape_and_finite(self, env):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        state = jax.jit(env.reset)(keys)
        assert state.obs.shape == (4, env.obs_dim)
        assert env.obs_dim == 358 + 576
        assert np.all(np.isfinite(np.asarray(state.obs)))
        assert state.amp_obs.shape == (4, env.amp_obs_dim)

    def test_reset_matches_reference_state(self, env):
        """RSI must put the sim exactly on the reference motion."""
        keys = jax.random.split(jax.random.PRNGKey(1), 8)
        state = jax.jit(env.reset)(keys)
        from pulse_tpu.motion import get_motion_state

        t = state.start_time
        ref = get_motion_state(env.motion, state.motion_id, t)
        # interframe times: motion-lib lerps global positions while the sim
        # state FKs the slerped local rotations -> few-mm interpolation gap
        np.testing.assert_allclose(
            state.physics.body_pos, ref["rg_pos"], atol=1.5e-2
        )
        # task obs diffs (first 72 entries = diff_local_body_pos) are the
        # one-frame displacement to the NEXT target (humanoid_im.py:708-729):
        # small but nonzero — bounded by ~max limb speed * dt
        task = np.asarray(state.obs[:, env.self_obs_dim :])
        assert np.abs(task[:, :72]).max() < 0.25

    def test_amp_obs_consistency(self, env):
        """≙ HACK_CONSISTENCY_TEST (humanoid_amp.py:748-783): after
        teleporting the sim onto the reference state, the sim-derived AMP
        obs must match the motion-lib-derived AMP obs."""
        from pulse_tpu.env import kernels
        from pulse_tpu.motion import get_motion_state

        keys = jax.random.split(jax.random.PRNGKey(11), 4)
        state = env.reset(keys)
        # sim-derived AMP obs straight from the teleported physics state
        sim_amp = np.asarray(jax.vmap(env._amp_obs)(state))
        ref = get_motion_state(env.motion, state.motion_id, state.start_time)
        lib_amp = np.asarray(
            kernels.build_amp_observations_smpl(
                ref["root_pos"], ref["root_rot"], ref["root_vel"],
                ref["root_ang_vel"], ref["dof_pos"], ref["dof_vel"],
                ref["rg_pos"][:, env.key_body_ids],
            )
        )
        # blended interframe states introduce small lerp-vs-FK gaps
        np.testing.assert_allclose(sim_amp, lib_amp, atol=3e-2)


class TestStep:
    def test_step_shapes(self, env):
        keys = jax.random.split(jax.random.PRNGKey(2), 4)
        state = env.reset(keys)
        actions = jnp.zeros((4, env.action_dim))
        step = jax.jit(env.step)
        out = step(state, actions)
        assert out.obs.shape == (4, env.obs_dim)
        assert out.reward.shape == (4,)
        assert out.done.shape == (4,)
        assert np.all(np.isfinite(np.asarray(out.obs)))
        assert np.all(np.asarray(out.progress) >= 0)

    def test_tracking_reward_reasonable_at_reset(self, env):
        """One physics step from RSI with PD holding the pose should stay
        close to the reference -> high position reward component."""
        keys = jax.random.split(jax.random.PRNGKey(3), 8)
        state = env.reset(keys)
        from pulse_tpu.physics.state import dof_pos_from_state

        dof = jax.vmap(dof_pos_from_state)(state.physics)
        # action that maps to the current pose as PD target
        action = (dof - env.model.pd_action_offset) / env.model.pd_action_scale
        out = jax.jit(env.step)(state, action)
        r_pos = np.asarray(out.reward_raw[:, 0])
        assert np.mean(r_pos) > 0.5, r_pos

    def test_bad_action_terminates_eventually(self, env):
        keys = jax.random.split(jax.random.PRNGKey(4), 4)
        state = env.reset(keys)
        # slam all joints to an extreme pose -> quickly diverges from ref
        action = jnp.ones((4, env.action_dim))
        step = jax.jit(env.step)
        terminated = np.zeros(4, bool)
        for _ in range(30):
            state = step(state, action)
            terminated |= np.asarray(state.terminate)
        assert terminated.any()

    def test_auto_reset_restores_tracking(self, env):
        keys = jax.random.split(jax.random.PRNGKey(5), 4)
        state = env.reset(keys)
        step = jax.jit(env.step)
        action = jnp.ones((4, env.action_dim))
        for _ in range(40):
            state = step(state, action)
        # after resets, progress should have wrapped for terminated envs
        assert np.asarray(state.progress).max() <= 40
