"""Record a policy rollout to .npz for offline visualization.

≙ the reference's HACK_OUTPUT_MOTION state dumps (humanoid_amp.py:785-831)
and video-recording path (base_task.py:404-445) — headless: run a trained
(or random) policy in the HumanoidIm env and dump per-frame body
positions/rotations, which scripts/play_motion.py can render.

Usage:
  python scripts/record_rollout.py --ckpt output/exp/ckpt [--steps 300] \
      [--out rollout.npz]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--num_envs", type=int, default=4)
    ap.add_argument("--out", default="rollout.npz")
    args = ap.parse_args()

    from __graft_entry__ import _make_env
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig

    env = _make_env()
    agent = PPOAgent(env, PPOConfig(num_envs=args.num_envs))
    ts = agent.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from pulse_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

        path = latest_checkpoint(args.ckpt) or args.ckpt
        ts = restore_checkpoint(path, ts)
        print(f"restored {path}")

    @jax.jit
    def policy_step(ts, state):
        obs_n = ts.obs_rms.normalize(state.obs)
        mu, _, _ = agent.network.apply({"params": ts.params}, obs_n)
        return env.step(state, jnp.clip(mu, -1.0, 1.0))

    state = env.reset(jax.random.split(jax.random.PRNGKey(1), args.num_envs))
    frames_pos, frames_rot, rewards = [], [], []
    for _ in range(args.steps):
        state = policy_step(ts, state)
        frames_pos.append(np.asarray(state.physics.body_pos))
        frames_rot.append(np.asarray(state.physics.body_rot))
        rewards.append(np.asarray(state.reward))

    from pulse_tpu.assets import load_smpl_humanoid

    tree = load_smpl_humanoid().skeleton
    np.savez(
        args.out,
        body_pos=np.stack(frames_pos)[:, 0],   # first env for the renderer
        body_rot=np.stack(frames_rot)[:, 0],
        all_body_pos=np.stack(frames_pos),
        rewards=np.stack(rewards),
        node_names=np.asarray(tree.node_names),
        parents=tree.parent_indices,
    )
    print(
        f"wrote {args.out}: {args.steps} frames, mean reward "
        f"{np.stack(rewards).mean():.3f}"
    )


if __name__ == "__main__":
    main()
