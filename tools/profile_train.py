"""Profile one PPO train epoch: rollout vs GAE vs update wall split, plus
the top device ops of the update program.

Usage: python tools/profile_train.py [num_envs] [learning=im_ppo overrides...]

The update is the training bottleneck (round-2 VERDICT: 1.45M env steps/s
env-only vs 240k incl. learner) — this tool attributes where the update's
time goes so optimization is targeted, mirroring what profile_step.py does
for the env step. ≙ the role of the reference's torch profiler hooks around
calc_gradients (phc/learning/common_agent.py:357-477).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _time_call(fn, *args, n=4, **kw):
    out = fn(*args, **kw)  # compile
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n, out


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
    overrides = sys.argv[2:]

    from pulse_tpu import run as run_mod
    from pulse_tpu.utils.config import load_config

    cfg = load_config(
        ["env=im", "learning=im_ppo", f"num_envs={num_envs}", *overrides]
    )
    spec, model = run_mod.build_model_from_cfg(cfg)
    motion = run_mod.build_motion_from_cfg(cfg, spec)
    env = run_mod.build_env_from_cfg(cfg, model, motion)
    agent = run_mod.build_agent_from_cfg(cfg, env)
    ppo = agent.ppo if hasattr(agent, "ppo") else agent

    ts = agent.init(jax.random.PRNGKey(0))
    ppo_ts = ts.ppo if hasattr(ts, "ppo") else ts

    horizon = ppo.config.horizon_length
    steps_per_epoch = num_envs * horizon
    print(f"num_envs={num_envs} horizon={horizon} "
          f"minibatch={ppo.config.minibatch_size} "
          f"mini_epochs={ppo.config.mini_epochs}")

    # --- phase split: rollout / GAE / update as separate jitted programs ---
    roll = jax.jit(ppo.rollout)
    t_roll, (ppo_ts2, traj, last_value) = _time_call(roll, ppo_ts)
    gae = jax.jit(ppo.compute_gae)
    t_gae, (advantages, returns) = _time_call(gae, traj, last_value)
    upd = jax.jit(ppo.update)
    t_upd, _ = _time_call(upd, ppo_ts2, traj, advantages, returns)

    # --- fused epoch (what training actually runs, with donation) ---
    train = jax.jit(agent.train_epoch, donate_argnums=0)
    ts, _ = train(ts)  # compile
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    n = 4
    t0 = time.perf_counter()
    for _ in range(n):
        ts, _ = train(ts)
    jax.block_until_ready(jax.tree.leaves(ts)[0])
    t_epoch = (time.perf_counter() - t0) / n

    print(f"rollout: {t_roll*1e3:8.1f} ms  ({steps_per_epoch/t_roll/1e3:8.0f}k env steps/s)")
    print(f"gae:     {t_gae*1e3:8.1f} ms")
    print(f"update:  {t_upd*1e3:8.1f} ms")
    print(f"epoch (fused, donated): {t_epoch*1e3:8.1f} ms "
          f"-> {steps_per_epoch/t_epoch/1e3:.0f}k train steps/s")

    # update FLOPs model: mini_epochs passes over T*B samples, fwd+bwd ~ 6x
    # params-per-sample matmul FLOPs
    p_tot = sum(
        x.size for x in jax.tree.leaves(ppo_ts.params) if x.ndim == 2
    )
    flops = 6 * p_tot * steps_per_epoch * ppo.config.mini_epochs
    print(f"update matmul FLOPs/epoch ~ {flops/1e12:.1f} TF "
          f"-> {flops/t_upd/1e12:.0f} TF/s achieved in update "
          f"(v5e bf16 peak ~197 TF/s)")

    # --- trace the update program and summarize device ops ---
    logdir = "/tmp/pulse_profile_train"
    with jax.profiler.trace(logdir):
        for _ in range(2):
            out = upd(ppo_ts2, traj, advantages, returns)
        jax.block_until_ready(jax.tree.leaves(out)[0])

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
        dur = ev.get("dur", 0) / 1e3  # ms
        args = ev.get("args", {})
        if "long_name" in args or "tf_op" in args or name.startswith(
            ("fusion", "copy", "dynamic", "scatter", "gather", "dot",
             "transpose", "reduce", "convert", "broadcast", "select",
             "while", "custom", "all-", "loop")
        ):
            key = name.split(".")[0]
            durs[key] += dur
            counts[key] += 1
            total += dur

    print(f"\nupdate trace: total device op time over 2 calls: {total:.2f} ms "
          f"({total/2:.2f}/call)")
    for k in sorted(durs, key=durs.get, reverse=True)[:20]:
        print(f"{durs[k]:9.2f} ms  x{counts[k]:5d}  {k}")


if __name__ == "__main__":
    main()
