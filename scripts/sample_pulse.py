"""Sample random motion from PULSE as a generative model.

≙ SURVEY §3.4 / README.MD:87-92 of the reference: z is drawn from the
learned prior conditioned on the current self obs
(amp_network_z_builder.py:101-116 reparameterize(prior_mu, prior_logvar)),
decoded to motor actions by the frozen decoder, and the humanoid improvises
motion with termination disabled. Dumps frames for scripts/play_motion.py.

Usage:
  python scripts/sample_pulse.py [--ckpt output/distill/ckpt] [--steps 300]
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
    ap.add_argument("--num_envs", type=int, default=2)
    ap.add_argument("--out", default="pulse_samples.npz")
    ap.add_argument("--temperature", type=float, default=1.0)
    args = ap.parse_args()

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.learning.distill import DistillAgent, DistillConfig
    from pulse_tpu.learning.networks import PulseVAE
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2)
    motion = build_motion_data(spec.skeleton, clips)
    # termination disabled: the humanoid free-runs on sampled latents
    env = HumanoidImEnv(
        model, motion, EnvConfig(enable_early_termination=False, cycle_motion=True)
    )
    net = PulseVAE(action_dim=env.action_dim, self_obs_dim=env.self_obs_dim)

    agent = DistillAgent(env, lambda obs: jnp.zeros((obs.shape[0], env.action_dim)))
    agent.network = net
    ds = agent.init(jax.random.PRNGKey(0))
    if args.ckpt:
        from pulse_tpu.utils.checkpoint import latest_checkpoint, restore_checkpoint

        path = latest_checkpoint(args.ckpt) or args.ckpt
        ds = restore_checkpoint(path, ds)
        print(f"restored {path}")

    @jax.jit
    def sample_step(ds, state, key):
        obs_n = ds.obs_rms.normalize(state.obs)
        self_obs = obs_n[..., : net.self_obs_dim]
        prior_mu, prior_logvar = net.apply(
            {"params": ds.params}, self_obs, method=PulseVAE.prior_params
        )
        eps = jax.random.normal(key, prior_mu.shape) * args.temperature
        z = prior_mu + jnp.exp(0.5 * prior_logvar) * eps
        action = net.apply({"params": ds.params}, self_obs, z, method=PulseVAE.decode)
        return env.step(state, jnp.clip(action, -1.0, 1.0))

    state = env.reset(jax.random.split(jax.random.PRNGKey(1), args.num_envs))
    key = jax.random.PRNGKey(2)
    frames = []
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state = sample_step(ds, state, k)
        frames.append(np.asarray(state.physics.body_pos))

    tree = spec.skeleton
    np.savez(
        args.out,
        body_pos=np.stack(frames)[:, 0],
        all_body_pos=np.stack(frames),
        node_names=np.asarray(tree.node_names),
        parents=tree.parent_indices,
    )
    print(f"wrote {args.out}: {args.steps} frames x {args.num_envs} envs")


if __name__ == "__main__":
    main()
