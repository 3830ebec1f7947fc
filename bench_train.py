"""Benchmark: end-to-end PPO training throughput (env rollout + learner
update) on the humanoid imitation task at the reference's default scale
(3072 envs, 2048-1536-1024 actor/critic, minibatch 16384, 6 mini-epochs —
env_im_vae.yaml / im_z_fit.yaml defaults).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline context: the reference's rl-games PPO trains at O(10k) env
steps/s on one A100 (BASELINE.md).

Env vars: BENCH_TRAIN_NUM_ENVS (default 3072), BENCH_TRAIN_EPOCHS
(default 6 timed epochs), BENCH_TRAIN_REPEATS (default 3, median).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax


def main():
    num_envs = int(os.environ.get("BENCH_TRAIN_NUM_ENVS", 3072))
    epochs = int(os.environ.get("BENCH_TRAIN_EPOCHS", 6))
    repeats = int(os.environ.get("BENCH_TRAIN_REPEATS", 3))

    from pulse_tpu import run as run_mod
    from pulse_tpu.utils.config import load_config

    cfg = load_config(["env=im", "learning=im_ppo", f"num_envs={num_envs}"])
    spec, model = run_mod.build_model_from_cfg(cfg)
    motion = run_mod.build_motion_from_cfg(cfg, spec)
    env = run_mod.build_env_from_cfg(cfg, model, motion)
    agent = run_mod.build_agent_from_cfg(cfg, env)

    ts = agent.init(jax.random.PRNGKey(0))
    train = jax.jit(agent.train_epoch, donate_argnums=0)

    horizon = (agent.ppo if hasattr(agent, "ppo") else agent).config.horizon_length
    steps_per_epoch = num_envs * horizon

    # warmup/compile
    ts, _ = train(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])

    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(epochs):
            ts, _ = train(ts)
        jax.block_until_ready(jax.tree.leaves(ts)[0])
        dt = time.perf_counter() - t0
        rates.append(epochs * steps_per_epoch / dt)

    rates.sort()
    median = rates[len(rates) // 2]
    baseline = 1.0e4  # reference rl-games PPO on A100 (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"im_ppo training steps/s @ {num_envs} envs",
                "value": round(median, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(median / baseline, 3),
                "spread": [round(rates[0], 1), round(rates[-1], 1)],
            }
        )
    )


if __name__ == "__main__":
    main()
