"""Live demo server: stream sim frames, accept driving poses.

≙ the reference's server mode + demo stack (base_task.py:254-316 websocket
threads; scripts/demo/video_to_pose_server.py HybrIK->sim driving;
humanoid_im_demo.py inference env): a policy rolls the HumanoidIm env while
a TCP thread broadcasts frames to any connected viewer; if a client sends
{"cmd": "pose", "root_pos": [...], "dof_pos": [...]} the reference motion is
overridden by the streamed pose (kinematic drive).

Usage: python scripts/demo_server.py [--port 8765] [--steps 1000]
Viewer: PoseClient(port=...).recv() yields {"t", "body_pos", "reward"}.
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
    ap.add_argument("--port", type=int, default=8765)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--ckpt", default="")
    args = ap.parse_args()

    from __graft_entry__ import _make_env
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
    from pulse_tpu.utils.pose_server import PoseServer

    env = _make_env()
    agent = PPOAgent(env, PPOConfig(num_envs=1))
    ts = agent.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from pulse_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

        ts = restore_checkpoint(latest_checkpoint(args.ckpt) or args.ckpt, ts)

    @jax.jit
    def policy_step(ts, state):
        obs_n = ts.obs_rms.normalize(state.obs)
        mu, _, _ = agent.network.apply({"params": ts.params}, obs_n)
        return env.step(state, jnp.clip(mu, -1.0, 1.0))

    server = PoseServer(port=args.port)
    print(f"demo server on port {server.port}")
    state = env.reset(jax.random.split(jax.random.PRNGKey(1), 1))
    try:
        for i in range(args.steps):
            cmd = server.poll_command()
            if cmd and cmd.get("cmd") == "motion":
                # interactive clip switching (≙ HumanoidImDemo driving a
                # chosen motion, humanoid_im_demo.py + begin_seq_motion):
                # reset the env onto the requested clip/time and keep the
                # policy in the loop
                mid = jnp.asarray([int(cmd.get("id", 0)) % int(env.motion.num_motions)])
                t0 = jnp.asarray([float(cmd.get("time", 0.0))])
                state = env.reset_to(
                    jax.random.split(jax.random.PRNGKey(100 + i), 1), mid, t0
                )
            elif cmd and cmd.get("cmd") == "pose":
                # kinematically drive toward the streamed pose: override the
                # physics state root/dof directly (≙ HACK_MOTION_SYNC)
                from pulse_tpu.physics.state import state_from_kinematics

                ph = state_from_kinematics(
                    env.model,
                    jnp.asarray(cmd.get("root_pos", [0, 0, 0.94])),
                    jnp.asarray(cmd.get("root_rot", [0, 0, 0, 1.0])),
                    jnp.asarray(cmd.get("dof_pos", np.zeros(env.action_dim))),
                    jnp.zeros(3), jnp.zeros(3), jnp.zeros(env.action_dim),
                )
                state = state.replace(
                    physics=jax.tree.map(lambda x: x[None], ph)
                )
            state = policy_step(ts, state)
            server.publish(
                {
                    "t": i / 30.0,
                    "body_pos": np.asarray(state.physics.body_pos[0]).tolist(),
                    "reward": float(state.reward[0]),
                }
            )
    finally:
        server.close()


if __name__ == "__main__":
    main()
