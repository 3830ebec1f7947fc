"""Reference-scale multichip partitioning check (compile-only).

The driver's `dryrun_multichip` validates that every PULSE stage's sharded
program compiles AND executes — at toy scale. This tool closes the other
half: it compiles the REFERENCE-SCALE training epoch (2048-1536-1024 nets,
minibatch 16384, 6 mini-epochs — the protocol of
/root/reference/phc/data/cfg/**; env count per --envs) over an N-device
mesh and records, from the compiled executable itself:

  * per-device memory footprint (XLA buffer assignment: arguments,
    outputs, temporaries, generated code) — asserted under the v5e HBM
    budget so the DP sharding actually fits a real chip,
  * the collective operations GSPMD inserted (all-reduce/all-gather/...),
    asserted to be gradient/metric psum-shaped: all-reduces present, no
    all-to-alls, and no all-gather of rollout-sized buffers (which would
    mean the env axis silently de-shards).

Compile-only: nothing is executed, so it runs on the virtual CPU mesh in
this container (no multi-chip hardware). Buffer assignment is
backend-specific, but argument/output/temp sizes come from the logical
program + sharding, which is what the assertion needs. The physics path
compiled here is the XLA one (the Pallas kernel's shard_map path is
execution-checked at toy scale by dryrun_multichip and on device by
tools/check_pallas_tpu.py).

Usage: python tools/check_partitioning.py [--devices 8] [--envs 3072]
Writes the JSON report to --out (default quality/partitioning_r5.json).
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _force_virtual_cpu_mesh  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--envs", type=int, default=3072)
    ap.add_argument("--hbm_gb", type=float, default=14.0,
                    help="per-device budget to assert (v5e has 16 GB)")
    ap.add_argument("--out", default="quality/partitioning_r5.json")
    args = ap.parse_args()

    _force_virtual_cpu_mesh(args.devices)

    import jax

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.learning.amp import AMPConfig
    from pulse_tpu.learning.amp_agent import AMPAgent
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.learning.ppo import PPOConfig
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.parallel import make_mesh, shard_train_state
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=2.0)
    motion = build_motion_data(spec.skeleton, clips)
    env = HumanoidImEnv(model, motion, EnvConfig())
    # env.mesh routes the update phase through the shard_map DP path
    # (ppo/amp/distill _update_dp) — the first run of this tool, without it,
    # proved GSPMD all-gathers the full rollout through the global shuffle
    env.mesh = make_mesh(args.devices)

    agent = AMPAgent(
        env,
        PPOConfig(
            num_envs=args.envs,
            horizon_length=32,
            minibatch_size=16384,
            mini_epochs=6,
        ),
        AMPConfig(),
        ActorCritic(
            action_dim=env.action_dim,
            actor_units=(2048, 1536, 1024),
            critic_units=(2048, 1536, 1024),
        ),
    )
    mesh = env.mesh
    t0 = time.time()
    ts = shard_train_state(mesh, agent.init(jax.random.PRNGKey(0)))
    lowered = jax.jit(agent.train_epoch).lower(ts)
    compiled = lowered.compile()
    compile_s = time.time() - t0

    mem = compiled.memory_analysis()
    per_device = {
        "argument_bytes": int(mem.argument_size_in_bytes),
        "output_bytes": int(mem.output_size_in_bytes),
        "temp_bytes": int(mem.temp_size_in_bytes),
        "generated_code_bytes": int(mem.generated_code_size_in_bytes),
        "alias_bytes": int(mem.alias_size_in_bytes),
    }
    # arguments/outputs alias heavily (donated train state); peak live is
    # bounded by max(arg, out) + temp + code
    peak = (
        max(per_device["argument_bytes"], per_device["output_bytes"])
        + per_device["temp_bytes"]
        + per_device["generated_code_bytes"]
    )
    budget = int(args.hbm_gb * 1024**3)

    hlo = compiled.as_text()
    counts = {
        name: len(re.findall(rf"\b{name}\b", hlo))
        for name in (
            "all-reduce", "all-gather", "reduce-scatter",
            "all-to-all", "collective-permute",
        )
    }
    # an all-gather whose result is rollout-sized would mean the env axis
    # got de-sharded somewhere: flag any all-gather output bigger than
    # one device's env shard of the rollout observation buffer
    shard_envs = args.envs // args.devices
    rollout_shard_bytes = shard_envs * 32 * env.obs_dim * 4
    big_gathers = [
        ln.strip()[:160]
        for ln in hlo.splitlines()
        if " all-gather" in ln
        and _result_bytes(ln) > rollout_shard_bytes
    ]

    report = {
        "devices": args.devices,
        "num_envs": args.envs,
        "nets": "2048-1536-1024 actor+critic, minibatch 16384, 6 mini-epochs",
        "compile_s": round(compile_s, 1),
        "per_device": per_device,
        "per_device_peak_bytes": int(peak),
        "per_device_peak_gb": round(peak / 1024**3, 3),
        "hbm_budget_gb": args.hbm_gb,
        "collectives": counts,
        "oversized_all_gathers": big_gathers,
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=2))

    assert peak < budget, (
        f"per-device peak {peak / 1024**3:.2f} GB exceeds the "
        f"{args.hbm_gb} GB budget — the DP sharding does not fit a v5e"
    )
    assert counts["all-reduce"] >= 1, (
        "no all-reduce in the compiled epoch — gradient psums are missing, "
        "the mesh is not actually synchronizing parameters"
    )
    assert counts["all-to-all"] == 0, (
        "unexpected all-to-all — DP over the env axis should never need one"
    )
    assert not big_gathers, (
        "rollout-sized all-gather found — the env axis de-shards mid-epoch:\n"
        + "\n".join(big_gathers)
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"ok — report written to {args.out}")


def _result_bytes(hlo_line: str) -> int:
    """Bytes of the first shape literal on an HLO text line (f32[a,b,...])."""
    m = re.search(r"(f32|bf16|s32|u32|pred|f16)\[([0-9,]*)\]", hlo_line)
    if not m:
        return 0
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                   "pred": 1}[m.group(1)]
    dims = m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * dtype_bytes


if __name__ == "__main__":
    main()
