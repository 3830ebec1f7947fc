"""Episode-return evaluation for downstream task envs.

≙ the reference's AMPPlayerContinuous run loop (amp_players.py:17-148 /
common_player.py:13-210): roll deterministic-policy episodes and report
mean return / episode length / termination rate. This is the `test=true`
path for Speed/Reach/Strike/Traj/Terrain (+Z) envs, which have no
reference motion to score against (im_eval covers the imitation envs).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TaskEvalResult:
    episodes: int
    return_mean: float
    return_std: float
    length_mean: float
    terminate_rate: float
    reward_per_step: float


def task_eval(
    env,
    policy_fn,
    batch_size: int = 64,
    num_steps: int | None = None,
    seed: int = 0,
) -> TaskEvalResult:
    """Roll `num_steps` (default: one episode length) with auto-reset on and
    aggregate per-episode returns in-graph."""
    num_steps = num_steps or int(env.config.episode_length)
    keys = jax.random.split(jax.random.PRNGKey(seed), batch_size)
    state = env.reset(keys)

    def scan_step(carry, _):
        state, ret_acc, ep_len, done_count, term_count, ret_sum, ret_sq, len_sum = carry
        action = policy_fn(state.obs)
        state = env.step(state, action)
        ret_acc = ret_acc + state.reward
        ep_len = ep_len + 1
        done = state.done
        # on episode end, bank the accumulated return/length and reset
        ret_sum = ret_sum + jnp.where(done, ret_acc, 0.0).sum()
        ret_sq = ret_sq + jnp.where(done, ret_acc**2, 0.0).sum()
        len_sum = len_sum + jnp.where(done, ep_len, 0).sum()
        done_count = done_count + done.sum()
        term_count = term_count + state.terminate.sum()
        ret_acc = jnp.where(done, 0.0, ret_acc)
        ep_len = jnp.where(done, 0, ep_len)
        return (
            state, ret_acc, ep_len, done_count, term_count, ret_sum, ret_sq, len_sum
        ), state.reward.mean()

    init = (
        state,
        jnp.zeros(batch_size),
        jnp.zeros(batch_size, jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
        jnp.zeros(()),
        jnp.zeros(()),
        jnp.zeros((), jnp.int32),
    )
    (state, ret_acc, ep_len, dones, terms, ret_sum, ret_sq, len_sum), step_rewards = jax.jit(
        lambda c: jax.lax.scan(scan_step, c, None, length=num_steps)
    )(init)

    n = max(int(dones), 1)
    mean = float(ret_sum) / n
    var = max(float(ret_sq) / n - mean**2, 0.0)
    return TaskEvalResult(
        episodes=int(dones),
        return_mean=mean,
        return_std=float(np.sqrt(var)),
        length_mean=float(len_sum) / n,
        terminate_rate=float(terms) / max(int(dones), 1),
        reward_per_step=float(jnp.mean(step_rewards)),
    )
