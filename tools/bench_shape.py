"""Benchmark the shape-varied env step (per-env models on the Pallas
mega-kernel via model-row block inputs) against the homogeneous hot path.

Round-3 VERDICT #8 acceptance: env=im_shape-style stepping within ~20% of
the homogeneous path instead of the ~7x XLA-fallback cliff.

Prints one JSON line with both rates. Env vars: BENCH_NUM_ENVS, BENCH_STEPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PULSE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["PULSE_PLATFORM"]
    jax.config.update("jax_platforms", os.environ["PULSE_PLATFORM"])

import jax.numpy as jnp


def measure(env, num_envs, steps=64, repeats=5):
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
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, key = run(state, key)
        jax.block_until_ready(state.obs)
        rates.append(steps * num_envs / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def main():
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 3072))
    steps = int(os.environ.get("BENCH_STEPS", 64))
    out_path = os.environ.get("BENCH_OUT", "")
    # BENCH_PALLAS=0 keeps CPU smoke runs off interpret-mode Pallas
    # (minutes per kernel call — CLAUDE.md); default on for real TPU runs.
    use_pallas = os.environ.get("BENCH_PALLAS", "1") != "0"

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=2.0)
    motion = build_motion_data(spec.skeleton, clips)

    homo = HumanoidImEnv(model, motion, EnvConfig(use_pallas_physics=use_pallas))
    r_homo = measure(homo, num_envs, steps)
    print(f"[bench_shape] homogeneous kernel: {r_homo:,.0f} steps/s", flush=True)

    # shape-varied env: per-env scaled models + shape obs channels
    # (the env=im_shape training posture)
    varied = HumanoidImEnv(
        model, motion,
        EnvConfig(has_shape_obs=True, has_shape_obs_disc=True,
                  has_limb_weight_obs=True,
                  use_pallas_physics=use_pallas),
    )
    varied.enable_shape_variation(jax.random.PRNGKey(7), num_envs)
    assert varied.batched_model is not None
    r_varied = measure(varied, num_envs, steps)
    print(f"[bench_shape] shape-varied kernel: {r_varied:,.0f} steps/s", flush=True)

    report = {
        "metric": f"shape-varied env steps/s @ {num_envs}",
        "homogeneous_kernel": round(r_homo, 1),
        "shape_varied_kernel": round(r_varied, 1),
        "varied_over_homogeneous": round(r_varied / r_homo, 4),
    }
    # The acceptance metric (varied/homogeneous) is complete here — persist
    # it BEFORE the informational XLA-fallback arm, which has crashed the
    # axon device twice at 3072 envs (per-env model leaves blow up the
    # unfused substep graph); losing the artifact to it is not acceptable.
    print(json.dumps(report), flush=True)
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=2)

    # the old fallback for comparison: same varied env forced off the kernel
    import dataclasses as dc

    xla_envs = min(num_envs, int(os.environ.get("BENCH_XLA_ENVS", 1024)))
    xla = varied.with_config(
        dc.replace(varied.config, use_pallas_physics=False)
    )
    if xla_envs != num_envs:
        xla = HumanoidImEnv(
            model, motion,
            dc.replace(varied.config, use_pallas_physics=False),
        )
        xla.enable_shape_variation(jax.random.PRNGKey(7), xla_envs)
    try:
        r_xla = measure(xla, xla_envs, steps)
        report["shape_varied_xla_fallback"] = round(r_xla, 1)
        report["xla_fallback_envs"] = xla_envs
        report["kernel_over_fallback"] = round(r_varied / r_xla, 2)
    except Exception as e:  # device faults on the fallback arm are tolerated
        report["shape_varied_xla_fallback"] = None
        report["xla_fallback_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(report))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
