"""AMASS-scale motion-store soak: build a ~10k-clip / ~1M-frame synthetic
store and verify the framework holds up at real-dataset scale
(≙ the reference loading the full AMASS DB, motion_lib_base.py:179-323):

  1. store build time + device memory footprint
  2. env-step throughput with the big store vs a small store (per-step
     gather cost must stay flat — queries are O(batch), not O(frames))
  3. PMCP reweighting over 10k clips (hard-negative write + categorical
     sampling concentrates on the failed set)
  4. training-alongside check: a PPO epoch at --envs runs with the store
     resident (no OOM)

Usage:
  python tools/soak_store.py [--clips 10000] [--seconds 4] [--envs 3072]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PULSE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["PULSE_PLATFORM"]
    jax.config.update("jax_platforms", os.environ["PULSE_PLATFORM"])

import jax.numpy as jnp


def device_mem_gb():
    """Live/peak device memory if the backend exposes it (axon may not)."""
    try:
        s = jax.local_devices()[0].memory_stats() or {}
        return {
            "live_gb": round(s.get("bytes_in_use", 0) / 2**30, 3),
            "peak_gb": round(s.get("peak_bytes_in_use", 0) / 2**30, 3),
        }
    except Exception:
        return None


def step_rate(env, num_envs, steps=64):
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(env.reset)(keys)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = 0.1 * jax.random.normal(ka, (num_envs, env.action_dim))
            return (env.step(st, a), k), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=steps)
        return state, key

    key = jax.random.PRNGKey(1)
    state, key = run(state, key)
    jax.block_until_ready(state.obs)
    t0 = time.perf_counter()
    state, key = run(state, key)
    jax.block_until_ready(state.obs)
    return steps * num_envs / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=10000)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--envs", type=int, default=3072)
    ap.add_argument("--train_epochs", type=int, default=3)
    ap.add_argument("--out", default="", help="write the report JSON here")
    args = ap.parse_args()

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOAgent, PPOConfig
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.motion.motion_lib import (
        sample_motions,
        update_hard_sampling_weight,
    )
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    report = {}

    # 1. store build --------------------------------------------------- #
    t0 = time.time()
    clips = make_synthetic_clips(
        spec.skeleton, num_clips=args.clips, seconds=args.seconds
    )
    t_gen = time.time() - t0
    print(f"[soak] generated {len(clips)} clips in {t_gen:.1f}s; FK build...",
          flush=True)
    t0 = time.time()
    motion = build_motion_data(spec.skeleton, clips)
    jax.block_until_ready(motion.gts)
    t_build = time.time() - t0
    F = int(motion.num_frames_total)
    store_bytes = sum(
        int(np.prod(x.shape)) * 4
        for x in (motion.gts, motion.grs, motion.gvs, motion.gavs,
                  motion.lrs, motion.dvs)
    )
    report["store"] = {
        "clips": int(motion.num_motions),
        "frames": F,
        "gen_s": round(t_gen, 1),
        "fk_build_s": round(t_build, 1),
        "device_gb": round(store_bytes / 2**30, 3),
    }
    print(json.dumps(report["store"]), flush=True)

    # 2. env-step cost flatness ---------------------------------------- #
    small = build_motion_data(
        spec.skeleton, make_synthetic_clips(spec.skeleton, num_clips=4)
    )
    env_small = HumanoidImEnv(model, small, EnvConfig())
    env_big = HumanoidImEnv(model, motion, EnvConfig())
    print("[soak] measuring step rates (first env compile is slow)...",
          flush=True)
    r_small = step_rate(env_small, args.envs)
    r_big = step_rate(env_big, args.envs)
    report["step_rate"] = {
        "small_store": round(r_small, 1),
        "big_store": round(r_big, 1),
        "big_over_small": round(r_big / r_small, 4),
        # direct duplication check: closed-over store arrays must be shared
        # buffers across the reset/step executables, not per-executable copies
        "device_mem": device_mem_gb(),
    }
    print(json.dumps(report["step_rate"]), flush=True)

    # 3. PMCP over 10k clips -------------------------------------------- #
    M = motion.num_motions
    failed = np.zeros(M, bool)
    failed[:: 97] = True  # ~1% hard set
    t0 = time.time()
    prob = update_hard_sampling_weight(motion, jnp.asarray(failed)).sampling_prob
    jax.block_until_ready(prob)
    t_w = time.time() - t0
    ids = jax.device_get(
        sample_motions(jax.random.PRNGKey(5), motion, 8192, prob=prob)
    )
    frac_hard = float(np.mean(failed[ids]))
    report["pmcp"] = {
        "write_s": round(t_w, 4),
        "hard_frac_sampled": round(frac_hard, 4),  # want ~1.0
    }
    print(json.dumps(report["pmcp"]), flush=True)
    assert frac_hard > 0.999, "hard-negative sampling leaked easy clips"

    # 4. training alongside the big store ------------------------------- #
    agent = PPOAgent(
        env_big,
        PPOConfig(num_envs=args.envs, horizon_length=32,
                  minibatch_size=16384, mini_epochs=6),
        ActorCritic(action_dim=env_big.action_dim),
    )
    ts = agent.init(jax.random.PRNGKey(0))
    train = jax.jit(agent.train_epoch, donate_argnums=0)
    print("[soak] compiling train_epoch with the big store resident...",
          flush=True)
    ts, m = train(ts)
    jax.block_until_ready(m["reward_mean"])
    t0 = time.time()
    for _ in range(args.train_epochs):
        ts, m = train(ts)
    jax.block_until_ready(m["reward_mean"])
    rate = args.train_epochs * args.envs * 32 / (time.time() - t0)
    report["train_with_big_store"] = {
        "epochs": args.train_epochs,
        "steps_per_s": round(rate, 1),
        "reward_finite": bool(np.isfinite(float(m["reward_mean"]))),
        "device_mem": device_mem_gb(),
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
