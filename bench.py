"""Benchmark: humanoid env throughput (physics + obs + reward + auto-reset)
for SMPL humanoids on the available accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The primary value is the median of BENCH_REPEATS timed windows at
BENCH_NUM_ENVS (default 3072, the reference's env_im_vae.yaml default and
the measured v5e sweet spot), with the fastest and slowest window dropped
(trimmed) before the spread is reported — the axon tunnel adds wall-clock
noise that a plain min/max overstates. A `device_ms_per_step` block reports
the XLA device-op time per step from BENCH_PROFILE_WINDOWS profiler traces
(median + spread): device time factors the tunnel out entirely, so its
spread is the bench's self-check (`device_spread_ok`, bound 10%).

Extra keys report a zero-action variant (trained-policy-like regime: most
envs stay up instead of the random-action fall/auto-reset regime), and the
same measurements at 4096 envs (the BASELINE.md north-star config).

`vs_baseline` context (NOT a measurement of the reference repo, which
publishes no throughput): Isaac Gym humanoid ~1e5 env-steps/s on one A100
per the Isaac Gym paper (BASELINE.md; arxiv 2108.10470).

Env vars: BENCH_NUM_ENVS, BENCH_STEPS, BENCH_REPEATS, BENCH_SKIP_4096=1,
BENCH_PROFILE_WINDOWS (0 disables device-time profiling).
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _trace_device_ms(logdir: str) -> float:
    """Device-busy time (ms) in the newest trace under logdir: the sum of
    the device process's "XLA Modules" events (one per executed program).
    Module durations are wall-exclusive on the device, so device <= wall
    holds by construction. (The per-op "XLA Ops" line OVERLAPS — ops run
    concurrently with DMA and each other — so summing it double-counts:
    that bug made BENCH_r04 report device 3.02 ms/step > wall 1.98.)"""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        return float("nan")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    device_pids = set()
    module_tids = {}  # pid -> tid of the "XLA Modules" line
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name" and ev["args"].get(
            "name", ""
        ).startswith("/device:"):
            device_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name" and ev["args"].get(
            "name"
        ) == "XLA Modules":
            module_tids[ev["pid"]] = ev.get("tid")
    total = 0.0
    found = False
    for ev in events:
        if (
            ev.get("ph") == "X"
            and ev.get("pid") in device_pids
            and ev.get("tid") == module_tids.get(ev.get("pid"))
        ):
            total += ev.get("dur", 0) / 1e3
            found = True
    return total if found else float("nan")


def _stats(rates: list) -> dict:
    """Median + trimmed spread (drop fastest and slowest window)."""
    rates = sorted(rates)
    trimmed = rates[1:-1] if len(rates) >= 4 else rates
    return {
        "median": rates[len(rates) // 2],
        "spread": [trimmed[0], trimmed[-1]],
        "raw_spread": [rates[0], rates[-1]],
    }


def measure(env, num_envs, steps, repeats, profile_windows=0):
    """Median steps/s over `repeats` windows for random- and zero-action
    regimes, sharing ONE compiled program (action scale is a traced input).
    With profile_windows > 0, also measures device-op ms/step from that many
    profiler traces of the random-action regime."""
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
        out[label] = _stats(rates)

    if profile_windows > 0:
        dev_ms = []
        key = jax.random.PRNGKey(2)
        s = jnp.asarray(0.1)
        prof_chunks = max(n_chunks // 2, 1)
        for w in range(profile_windows):
            logdir = f"/tmp/pulse_bench_profile_{num_envs}_{w}"
            try:
                with jax.profiler.trace(logdir):
                    for _ in range(prof_chunks):
                        st, key = run_chunk(st, key, s)
                    jax.block_until_ready(st.obs)
                ms = _trace_device_ms(logdir) / (prof_chunks * chunk)
                if ms == ms:  # not NaN
                    dev_ms.append(ms)
            except Exception as e:  # tunnel profiling flake: report, don't fail
                print(f"profile window {w} failed: {e}", file=sys.stderr)
        if dev_ms:
            st_d = _stats(dev_ms)
            med = st_d["median"]
            lo, hi = st_d["spread"]
            out["device_ms_per_step"] = {
                "median": round(med, 4),
                "spread": [round(lo, 4), round(hi, 4)],
                "windows": len(dev_ms),
                # self-check: device time excludes the tunnel; >10% spread
                # here means a real measurement problem, not tunnel noise
                "spread_ok": bool(med > 0 and (hi - lo) / med < 0.10),
            }
    return out


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 3072))
    steps = int(os.environ.get("BENCH_STEPS", 64))
    repeats = max(int(os.environ.get("BENCH_REPEATS", 7)), 1)
    profile_windows = int(os.environ.get("BENCH_PROFILE_WINDOWS", 3))

    from __graft_entry__ import _make_env

    env = _make_env()
    primary = measure(env, num_envs, steps, repeats, profile_windows)

    result = {
        "metric": f"humanoid_im env steps/s @ {num_envs} envs",
        "value": round(primary["random"]["median"], 1),
        "unit": "env_steps/s",
        # context multiple vs the Isaac Gym PAPER figure (the reference repo
        # publishes no throughput) — see module docstring
        "vs_baseline": round(primary["random"]["median"] / 1.0e5, 3),
        "baseline_kind": "isaacgym_paper_context",
        "spread": [round(x, 1) for x in primary["random"]["spread"]],
        "raw_spread": [round(x, 1) for x in primary["random"]["raw_spread"]],
        "windows": repeats,
        "zero_action": round(primary["zero"]["median"], 1),
    }
    if "device_ms_per_step" in primary:
        result["device_ms_per_step"] = primary["device_ms_per_step"]

    if not os.environ.get("BENCH_SKIP_4096") and num_envs != 4096:
        at4096 = measure(env, 4096, steps, repeats)
        result["at_4096"] = round(at4096["random"]["median"], 1)
        result["at_4096_zero_action"] = round(at4096["zero"]["median"], 1)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
