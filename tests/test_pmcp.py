"""PMCP sampling-weight threading: the live weights are a train-state leaf
(`motion_prob`) consumed by the env's in-graph auto-resets, so an
update_{hard,soft}_sampling_weight after an in-training eval is a device
write — the jitted train_epoch executable is REUSED, not rebuilt
(≙ motion_lib_base.py:378-384, where the update is a tensor assignment)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env import HumanoidImEnv, EnvConfig
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.motion.motion_lib import update_hard_sampling_weight
from pulse_tpu.physics import PhysicsConfig, build_model


@pytest.fixture(scope="module")
def env():
    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig(substeps=1))
    tree = spec.skeleton
    clips = make_synthetic_clips(tree, num_clips=3, seconds=1.0)
    motion = build_motion_data(tree, clips)
    return HumanoidImEnv(model, motion, EnvConfig())


class TestSamplingProbArg:
    def test_reset_respects_override(self, env):
        """A one-hot sampling_prob must pin every reset onto that clip,
        regardless of the store's baked-in uniform distribution."""
        one_hot = jnp.asarray([0.0, 1.0, 0.0])
        reset = jax.jit(
            lambda k: env.reset_one(k, sampling_prob=one_hot).motion_id
        )
        ids = np.asarray([reset(jax.random.PRNGKey(i)) for i in range(16)])
        assert (ids == 1).all()

    def test_none_falls_back_to_store(self, env):
        """sampling_prob=None keeps the baked-in distribution (all clips
        reachable under uniform weights)."""
        reset = jax.jit(lambda k: env.reset_one(k).motion_id)
        ids = np.asarray([reset(jax.random.PRNGKey(i)) for i in range(48)])
        assert set(np.unique(ids)) == {0, 1, 2}


class TestNoRetrace:
    def test_train_epoch_reused_after_pmcp_write(self, env):
        """≙ the eval→PMCP feedback loop in run.py: after writing new hard-
        negative weights into the train state, the next epoch must hit the
        already-compiled executable (cache size stays 1)."""
        from pulse_tpu.learning.networks import ActorCritic
        from pulse_tpu.learning.ppo import PPOAgent, PPOConfig

        agent = PPOAgent(
            env,
            PPOConfig(
                num_envs=2, horizon_length=2, minibatch_size=4, mini_epochs=1
            ),
            ActorCritic(
                action_dim=env.action_dim, actor_units=(32,), critic_units=(32,)
            ),
        )
        ts = agent.init(jax.random.PRNGKey(0))
        assert ts.motion_prob is not None and ts.motion_prob.shape == (3,)
        train = jax.jit(agent.train_epoch, donate_argnums=0)
        ts, _ = train(ts)
        assert train._cache_size() == 1

        failed = jnp.asarray([True, False, False])
        prob = update_hard_sampling_weight(env.motion, failed).sampling_prob
        ts = ts.replace(motion_prob=jnp.array(prob))  # copy: train donates ts
        ts, _ = train(ts)
        assert train._cache_size() == 1  # device write, no retrace

        # and the weights took effect: hard-negative resets sample clip 0 only
        done_ids = np.asarray(ts.env_state.motion_id)
        # (envs that auto-reset after the write land on clip 0; envs still on
        # their first episode may carry any id — assert via a direct reset)
        reset = jax.jit(
            lambda k: env.reset_one(k, sampling_prob=prob).motion_id
        )
        ids = np.asarray([reset(jax.random.PRNGKey(100 + i)) for i in range(8)])
        assert (ids == 0).all()
