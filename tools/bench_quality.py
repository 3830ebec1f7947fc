"""Hard synthetic quality benchmark: train an imitation policy on the
committed hard-clip suite (jumps, spins, getup-from-supine, fast run,
sharp turns, crouch walk — motion/synthetic.py make_hard_clips) and report
per-clip success + MPJPE against committed targets.

Plays the role of the reference's AMASS eval (phc/learning/im_amp.py:
136-363) as a hermetic regression benchmark: run each round on TPU, commit
the JSON/table to QUALITY.md, and compare against the previous round.

Also the Pallas-vs-XLA quality A/B harness (round-2 VERDICT #3): run once
with --pallas on (default) and once with --pallas off; training through the
mega-kernel must reach the same success/MPJPE as the XLA path within noise.

Usage:
  python tools/bench_quality.py [--epochs 1500] [--envs 2048]
      [--pallas on|off] [--seed 0] [--out /tmp/quality.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--envs", type=int, default=2048)
    ap.add_argument("--pallas", choices=["on", "off"], default="on")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="")
    ap.add_argument("--horizon", type=int, default=32)
    ap.add_argument(
        "--suite", choices=["hard", "graded"], default="hard",
        help="hard: 6-clip v2 stress set; graded: 30-clip family benchmark",
    )
    args = ap.parse_args()

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.eval.im_eval import im_eval
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
    from pulse_tpu.motion import build_motion_data
    from pulse_tpu.motion.synthetic import make_hard_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    if args.suite == "graded":
        from pulse_tpu.motion.synthetic import make_graded_suite

        clips, names, families = make_graded_suite(spec.skeleton)
        suite_label = "graded_v1"
    else:
        clips, names = make_hard_clips(spec.skeleton)
        families = None
        suite_label = "hard_synthetic_v2"
    motion = build_motion_data(spec.skeleton, clips)

    env = HumanoidImEnv(
        model, motion,
        EnvConfig(use_pallas_physics=(args.pallas == "on")),
    )
    # reference net sizes + im defaults (im_z_fit.yaml)
    agent = PPOAgent(
        env,
        PPOConfig(
            num_envs=args.envs,
            horizon_length=args.horizon,
            minibatch_size=16384,
            mini_epochs=6,
            learning_rate=2e-5,
        ),
        ActorCritic(action_dim=env.action_dim),
    )
    ts = agent.init(jax.random.PRNGKey(args.seed))
    train = jax.jit(agent.train_epoch, donate_argnums=0)

    t0 = time.time()
    steps_per_epoch = args.envs * args.horizon
    for epoch in range(args.epochs):
        ts, metrics = train(ts)
        if epoch % 100 == 0:
            r = float(metrics["reward_mean"])
            fps = steps_per_epoch * (epoch + 1) / (time.time() - t0)
            print(f"epoch={epoch} reward={r:.4f} fps={fps:,.0f}", flush=True)
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    train_time = time.time() - t0

    # deterministic-policy eval with early termination off
    import dataclasses as dc

    eval_env = env.with_config(
        dc.replace(env.config, enable_early_termination=False)
    )
    params, obs_rms = ts.params, ts.obs_rms

    def policy_fn(obs):
        mu, _, _ = agent.network.apply({"params": params}, obs_rms.normalize(obs))
        return jnp.clip(mu, -1.0, 1.0)

    result = im_eval(eval_env, policy_fn, batch_size=len(names))

    out = {
        "suite": suite_label,
        "pallas": args.pallas,
        "epochs": args.epochs,
        "envs": args.envs,
        "seed": args.seed,
        "train_steps": args.epochs * steps_per_epoch,
        "train_time_s": round(train_time, 1),
        "train_steps_per_s": round(args.epochs * steps_per_epoch / train_time, 1),
        "success_rate": round(result.success_rate, 4),
        "mpjpe_g_mm": round(result.mpjpe_g, 2),
        "mpjpe_l_mm": round(result.mpjpe_l, 2),
        "mpjpe_pa_mm": round(result.mpjpe_pa, 2),
        "per_clip": {
            n: {
                "success": bool(~result.failed_motions[i]),
                "mpjpe_g_mm": round(float(result.per_motion_mpjpe_g[i]), 2),
                "mpjpe_l_mm": round(float(result.per_motion_mpjpe_l[i]), 2),
            }
            for i, n in enumerate(names)
        },
    }
    if families is not None:
        out["per_family"] = {
            fam: {
                "passed": int(sum(~result.failed_motions[i] for i in idx)),
                "levels": {
                    names[i]: bool(~result.failed_motions[i]) for i in idx
                },
            }
            for fam, idx in families.items()
        }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
