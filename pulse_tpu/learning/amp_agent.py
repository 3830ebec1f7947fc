"""AMPAgent: PPO + adversarial motion prior, one jitted train_epoch.

≙ phc/learning/amp_agent.py:36 (AMPAgent.train_epoch/calc_gradients): the
rollout's task rewards are mixed with discriminator style rewards, the PPO
update runs on the mixture, and the discriminator takes its own gradient
step from rollout/replay/demo batches — all inside a single XLA program.

Parity machinery beyond the core loop:
  - recurrent rollouts: the RNN/BPTT path (≙ play_steps_rnn,
    amp_agent.py:192-339) reaches AMP — round 1 hardcoded the feedforward
    rollout;
  - pre_epoch (host-side, ≙ amp_agent.py:557-579): getup reward-weight
    schedule (task_w 0 / disc_w 1 until getup_update_epoch, then 0.5/0.5;
    the env's fall-init curriculum flips with it) and periodic shape
    resampling every shape_resampling_interval epochs;
  - the epoch-start frozen obs-stats trick lives in PPOAgent
    (temp_running_mean, ≙ amp_agent.py:578-603);
  - joint RL+kin mode (train_epoch_joint, ≙ amp_agent.py:637-654 +
    _optimize_kin): a distillation (BC+KLD) gradient step runs alongside
    the RL update in the same epoch.
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
                 amp_config: AMPConfig | None = None, network=None,
                 getup_update_epoch: int = 0,
                 shape_resampling_interval: int = 0):
        self.ppo = PPOAgent(env, ppo_config, network)
        self.amp = AMPModule(env, amp_config)
        self.env = env
        # schedule knobs (0 = off); ≙ getup_udpate_epoch and
        # shape_resampling_interval on the reference env
        self.getup_update_epoch = int(getup_update_epoch)
        self.shape_resampling_interval = int(shape_resampling_interval)

    def init(self, key: jax.Array) -> AMPTrainState:
        k1, k2 = jax.random.split(key)
        ts = AMPTrainState(ppo=self.ppo.init(k1), amp=self.amp.init(k2))
        if self.getup_update_epoch:
            # pure style reward while the getup curriculum runs
            ts = ts.replace(
                amp=ts.amp.replace(
                    task_reward_w=jnp.zeros(()), disc_reward_w=jnp.ones(())
                )
            )
        return ts

    # ------------------------------------------------------------------ #
    # host-side epoch schedule (≙ pre_epoch, amp_agent.py:557-579)
    # ------------------------------------------------------------------ #

    def pre_epoch(self, ts: AMPTrainState, epoch: int) -> AMPTrainState:
        """Call between jitted epochs. Reward-weight flips are device-scalar
        state updates (no retrace); a shape resample rebatches the env model
        (one retrace per interval, like the reference's env rebuild)."""
        self.needs_retrace = False
        if self.getup_update_epoch:
            past = epoch > self.getup_update_epoch
            ts = ts.replace(
                amp=ts.amp.replace(
                    task_reward_w=jnp.asarray(0.5 if past else 0.0),
                    disc_reward_w=jnp.asarray(0.5 if past else 1.0),
                )
            )
            if hasattr(self.env, "set_getup_phase"):
                self.needs_retrace |= self.env.set_getup_phase(past)
        if (
            self.shape_resampling_interval
            and epoch > 1
            and epoch % self.shape_resampling_interval == 1
            and getattr(self.env, "batched_model", None) is not None
        ):
            if getattr(self.env, "_shape_variation_args", None) is not None:
                # resample_shapes replays the original enable_shape_variation
                # arguments (SMPL model / beta_std), so an env built with
                # per-env SMPL-beta skeletons stays in that mode (it also
                # re-layers any physical-prop DR on the fresh shapes)
                self.env.resample_shapes(
                    jax.random.fold_in(jax.random.PRNGKey(17), epoch)
                )
                self.needs_retrace = True
            elif getattr(self.env, "_prop_rand_args", None) is not None:
                # DR-only env (batched model from randomize_physical_props,
                # no shape variation): re-draw the multipliers (≙ the
                # reset-gated actor_params path, base_task.py:643-686)
                _, n = self.env._prop_rand_args
                self.env.randomize_physical_props(
                    jax.random.fold_in(jax.random.PRNGKey(19), epoch), n
                )
                self.needs_retrace = True
        return ts

    # ------------------------------------------------------------------ #

    def train_epoch(self, ts: AMPTrainState):
        roll = self.ppo.rollout_rnn if self.ppo.recurrent else self.ppo.rollout
        ppo_ts, traj, last_value = roll(ts.ppo)
        return self.update_from_rollout(ts, ppo_ts, traj, last_value)

    def update_from_rollout(self, ts: AMPTrainState, ppo_ts, traj, last_value):
        """Everything after play_steps: reward mixing, PPO update, disc
        update. Split out so the joint RL+kin agent can run its kin update
        on the SAME rollout (≙ amp_agent.py:637-654)."""
        # no flatten: the disc applies on the last axis, and merging the
        # sharded env axis into [T*B] would make GSPMD re-shard under a mesh
        disc_r = self.amp.disc_reward(ts.amp, traj.amp_obs)
        task_r = traj.rewards
        mixed = self.amp.combine_rewards(task_r, disc_r, ts.amp)
        traj = traj.replace(rewards=mixed)

        advantages, returns = self.ppo.compute_gae(traj, last_value)
        upd = self.ppo.update_rnn if self.ppo.recurrent else self.ppo.update
        ppo_ts, ppo_metrics = upd(ppo_ts, traj, advantages, returns)

        key, k_disc = jax.random.split(ppo_ts.key)
        amp_state, disc_metrics = self.amp.update(ts.amp, k_disc, traj.amp_obs)
        ppo_ts = ppo_ts.replace(key=key)

        metrics = dict(ppo_metrics)
        metrics.update(disc_metrics)
        metrics["reward_mean"] = mixed.mean()
        metrics["task_reward_mean"] = task_r.mean()
        metrics["disc_reward_mean"] = disc_r.mean()
        return AMPTrainState(ppo=ppo_ts, amp=amp_state), metrics


@struct.dataclass
class JointTrainState:
    """AMP RL state + distillation state sharing one env rollout."""

    amp: AMPTrainState
    distill: "object"  # DistillState


class JointAMPDistillAgent:
    """Joint RL + kin gradient mode (≙ amp_agent.py:637-654 when
    only_kin_loss is False but save_kin_info is True): each epoch runs ONE
    AMP rollout; the PPO/disc updates AND the behavior-cloning + KLD
    distillation step both consume that rollout — kin labels are the frozen
    teacher queried on the rollout's observations, exactly the reference's
    kin_dict collected inside play_steps and consumed by _optimize_kin
    (amp_agent.py:771-849)."""

    def __init__(self, amp_agent: AMPAgent, distill_agent):
        self.amp_agent = amp_agent
        self.distill = distill_agent

    def init(self, key: jax.Array) -> JointTrainState:
        k1, k2 = jax.random.split(key)
        return JointTrainState(
            amp=self.amp_agent.init(k1), distill=self.distill.init(k2)
        )

    def pre_epoch(self, ts: JointTrainState, epoch: int) -> JointTrainState:
        ts = ts.replace(amp=self.amp_agent.pre_epoch(ts.amp, epoch))
        # surface the inner agent's retrace request — run.py reads it off
        # whatever agent object it holds
        self.needs_retrace = self.amp_agent.needs_retrace
        return ts

    def train_epoch(self, ts: JointTrainState):
        ppo = self.amp_agent.ppo
        roll = ppo.rollout_rnn if ppo.recurrent else ppo.rollout
        ppo_ts, traj, last_value = roll(ts.amp.ppo)
        amp_ts, rl_metrics = self.amp_agent.update_from_rollout(
            ts.amp, ppo_ts, traj, last_value
        )
        # kin gradient on the SAME rollout's (obs, teacher-label) pairs
        ds = ts.distill
        key, k_z = jax.random.split(ds.key)
        z_noise = jax.random.normal(
            k_z, traj.obs.shape[:-1] + (self.distill.network.latent_dim,)
        )
        kin_traj = {
            "obs": traj.obs,
            "gt_action": self.distill.teacher_fn(traj.obs),
            "z_noise": z_noise,
        }
        ds, kin_metrics = self.distill.update(ds.replace(key=key), kin_traj)
        metrics = dict(rl_metrics)
        metrics.update({f"kin_{k}": v for k, v in kin_metrics.items()})
        return JointTrainState(amp=amp_ts, distill=ds), metrics
