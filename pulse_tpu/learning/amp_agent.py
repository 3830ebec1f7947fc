"""AMPAgent: PPO + adversarial motion prior, one jitted train_epoch.

≙ phc/learning/amp_agent.py:36 (AMPAgent.train_epoch/calc_gradients): the
rollout's task rewards are mixed with discriminator style rewards, the PPO
update runs on the mixture, and the discriminator takes its own gradient
step from rollout/replay/demo batches — all inside a single XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.learning.amp import AMPConfig, AMPModule, AMPState
from pulse_tpu.learning.ppo import PPOAgent, PPOConfig, TrainState


@struct.dataclass
class AMPTrainState:
    ppo: TrainState
    amp: AMPState


class AMPAgent:
    def __init__(self, env, ppo_config: PPOConfig | None = None,
                 amp_config: AMPConfig | None = None, network=None):
        self.ppo = PPOAgent(env, ppo_config, network)
        self.amp = AMPModule(env, amp_config)
        self.env = env

    def init(self, key: jax.Array) -> AMPTrainState:
        k1, k2 = jax.random.split(key)
        return AMPTrainState(ppo=self.ppo.init(k1), amp=self.amp.init(k2))

    def train_epoch(self, ts: AMPTrainState):
        ppo_ts, traj, last_value = self.ppo.rollout(ts.ppo)

        disc_r = self.amp.disc_reward(
            ts.amp, traj.amp_obs.reshape(-1, traj.amp_obs.shape[-1])
        ).reshape(traj.rewards.shape)
        task_r = traj.rewards
        mixed = self.amp.combine_rewards(task_r, disc_r)
        traj = traj.replace(rewards=mixed)

        advantages, returns = self.ppo.compute_gae(traj, last_value)
        ppo_ts, ppo_metrics = self.ppo.update(ppo_ts, traj, advantages, returns)

        key, k_disc = jax.random.split(ppo_ts.key)
        amp_state, disc_metrics = self.amp.update(ts.amp, k_disc, traj.amp_obs)
        ppo_ts = ppo_ts.replace(key=key)

        metrics = dict(ppo_metrics)
        metrics.update(disc_metrics)
        metrics["reward_mean"] = mixed.mean()
        metrics["task_reward_mean"] = task_r.mean()
        metrics["disc_reward_mean"] = disc_r.mean()
        return AMPTrainState(ppo=ppo_ts, amp=amp_state), metrics
