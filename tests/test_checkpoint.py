"""Checkpoint round-trips, including num_envs-independent restore."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.learning.networks import ActorCritic
from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
from pulse_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    torch_linear_stack_to_flax,
)
from pulse_tpu import run as run_mod
from tests.test_learning import ToyEnv


def make_agent(num_envs):
    return PPOAgent(
        ToyEnv(),
        PPOConfig(num_envs=num_envs, horizon_length=4, minibatch_size=16, mini_epochs=1),
        ActorCritic(action_dim=2, actor_units=(16,), critic_units=(16,)),
    )


class TestCheckpoint:
    def test_roundtrip_diff_num_envs(self, tmp_path):
        agent_a = make_agent(8)
        ts_a = agent_a.init(jax.random.PRNGKey(0))
        ts_a, _ = jax.jit(agent_a.train_epoch)(ts_a)
        path = save_checkpoint(str(tmp_path / "ckpt"), 3, run_mod.strip_env_state(ts_a))

        agent_b = make_agent(4)  # different env count
        ts_b = agent_b.init(jax.random.PRNGKey(1))
        restored = restore_checkpoint(path, run_mod.strip_env_state(ts_b))
        ts_b = run_mod.attach_env_state(restored, ts_b)
        # params restored exactly
        for la, lb in zip(
            jax.tree.leaves(ts_a.params), jax.tree.leaves(ts_b.params)
        ):
            np.testing.assert_allclose(la, lb)
        # and training continues
        ts_b, metrics = jax.jit(agent_b.train_epoch)(ts_b)
        assert np.isfinite(float(metrics["reward_mean"]))

    def test_latest_checkpoint_selection(self, tmp_path):
        agent = make_agent(4)
        ts = run_mod.strip_env_state(agent.init(jax.random.PRNGKey(0)))
        save_checkpoint(str(tmp_path / "c"), 5, ts)
        save_checkpoint(str(tmp_path / "c"), 12, ts)
        assert latest_checkpoint(str(tmp_path / "c")).endswith("step_00000012")

    def test_torch_import(self):
        sd = {
            "mlp.0.weight": np.ones((8, 4), np.float32),
            "mlp.0.bias": np.zeros(8, np.float32),
            "mlp.2.weight": np.ones((2, 8), np.float32),
            "mlp.2.bias": np.zeros(2, np.float32),
        }
        params = torch_linear_stack_to_flax(sd, "mlp")
        assert params["Dense_0"]["kernel"].shape == (4, 8)
        assert params["Dense_1"]["kernel"].shape == (8, 2)
