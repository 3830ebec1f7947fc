"""Benchmark: humanoid env throughput (physics + obs + reward + auto-reset)
for SMPL humanoids on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The primary value is the median of BENCH_REPEATS timed windows at
BENCH_NUM_ENVS (default 3072, the reference's env_im_vae.yaml default and
the measured v5e sweet spot). Extra keys report the spread, a zero-action
variant (trained-policy-like regime: most envs stay up instead of the
random-action fall/auto-reset regime), and the same measurements at 4096
envs (the BASELINE.md north-star config).

Baseline context: Isaac Gym humanoid ~1e5 env-steps/s on one A100
(BASELINE.md; arxiv 2108.10470).

Env vars: BENCH_NUM_ENVS, BENCH_STEPS, BENCH_REPEATS, BENCH_SKIP_4096=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def measure(env, num_envs, steps, repeats):
    """Median steps/s over `repeats` windows for random- and zero-action
    regimes, sharing ONE compiled program (action scale is a traced input)."""
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(env.reset)(keys)
    chunk = 8

    @jax.jit
    def run_chunk(state, key, action_scale):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            actions = action_scale * jax.random.normal(
                ka, (num_envs, env.action_dim)
            )
            st = env.step(st, actions)
            return (st, k), None

        (state, key), _ = jax.lax.scan(body, (state, key), None, length=chunk)
        return state, key

    n_chunks = max(steps // chunk, 1)
    out = {}
    for label, scale in (("random", 0.1), ("zero", 0.0)):
        key = jax.random.PRNGKey(1)
        s = jnp.asarray(scale)
        st, key = run_chunk(state, key, s)  # warmup/compile (shared program)
        jax.block_until_ready(st.obs)
        rates = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            for _ in range(n_chunks):
                st, key = run_chunk(st, key, s)
            jax.block_until_ready(st.obs)
            dt = time.perf_counter() - t0
            rates.append(n_chunks * chunk * num_envs / dt)
        rates.sort()
        out[label] = {
            "median": rates[len(rates) // 2],
            "spread": [rates[0], rates[-1]],
        }
    return out


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 3072))
    steps = int(os.environ.get("BENCH_STEPS", 64))
    repeats = max(int(os.environ.get("BENCH_REPEATS", 3)), 1)

    from __graft_entry__ import _make_env

    env = _make_env()
    primary = measure(env, num_envs, steps, repeats)

    result = {
        "metric": f"humanoid_im env steps/s @ {num_envs} envs",
        "value": round(primary["random"]["median"], 1),
        "unit": "env_steps/s",
        "vs_baseline": round(primary["random"]["median"] / 1.0e5, 3),
        "spread": [round(x, 1) for x in primary["random"]["spread"]],
        "zero_action": round(primary["zero"]["median"], 1),
    }

    if not os.environ.get("BENCH_SKIP_4096") and num_envs != 4096:
        at4096 = measure(env, 4096, steps, repeats)
        result["at_4096"] = round(at4096["random"]["median"], 1)
        result["at_4096_zero_action"] = round(at4096["zero"]["median"], 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
