"""Capture an XLA device trace of the env step and print the top ops.

Writes a profile under /tmp/pulse_profile and summarizes the trace events
programmatically (no TensorBoard needed).
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from __graft_entry__ import _make_env

    env = _make_env()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = jax.jit(env.reset)(keys)
    actions = jnp.zeros((B, env.action_dim))
    step = jax.jit(env.step)
    state = step(state, actions)
    jax.block_until_ready(state.obs)

    logdir = "/tmp/pulse_profile"
    with jax.profiler.trace(logdir):
        for _ in range(5):
            state = step(state, actions)
        jax.block_until_ready(state.obs)

    # find the trace file
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as fh:
        trace = json.load(fh)

    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        # keep device op events only (heuristic: they have 'dur' and args)
        dur = ev.get("dur", 0) / 1e3  # ms
        args = ev.get("args", {})
        if "long_name" in args or "tf_op" in args or name.startswith(("fusion", "copy", "dynamic", "scatter", "gather", "dot", "transpose", "reduce", "convert", "broadcast", "select", "while", "custom", "all-")):
            key = name.split(".")[0]
            durs[key] += dur
            counts[key] += 1
            total += dur

    print(f"total device op time over 5 steps: {total:.2f} ms ({total/5:.2f}/step)")
    for k in sorted(durs, key=durs.get, reverse=True)[:25]:
        print(f"{durs[k]:9.2f} ms  x{counts[k]:5d}  {k}")


if __name__ == "__main__":
    main()
