"""Clip feasibility diagnostic: drive the sim with PERFECT PD targets (the
reference clip's own next-frame dof pose) from the clip's start state and
measure tracked-body drift — the physics analogue of the reference's
HACK_MOTION_SYNC consistency check (humanoid_im.py:991-1040).

If even oracle targets can't keep mean tracked drift under the 0.5 m
success bound, the clip is infeasible for this actuator configuration
(PD gains / torque limits / contact model) and NO policy can pass it —
the benchmark must then be read as actuator-limited, not learning-limited.

Usage: python tools/clip_feasibility.py [--suite hard|easy]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

if os.environ.get("PULSE_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["PULSE_PLATFORM"]
    jax.config.update("jax_platforms", os.environ["PULSE_PLATFORM"])

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", choices=["hard", "easy"], default="hard")
    args = ap.parse_args()

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.motion.motion_lib import get_motion_state
    from pulse_tpu.motion.synthetic import make_hard_clips
    from pulse_tpu.physics import PhysicsConfig, build_model
    from pulse_tpu.physics.step import physics_step

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    if args.suite == "hard":
        clips, names = make_hard_clips(spec.skeleton)
    else:
        clips = make_synthetic_clips(spec.skeleton, num_clips=4)
        names = [f"easy_{i}" for i in range(len(clips))]
    motion = build_motion_data(spec.skeleton, clips)
    env = HumanoidImEnv(
        model, motion, EnvConfig(enable_early_termination=False)
    )
    M = motion.num_motions
    dt = model.config.control_dt
    reset_ids = jnp.asarray(env.reset_body_ids)
    max_steps = int(np.ceil(float(jnp.max(motion.motion_lengths)) / dt))

    ids = jnp.arange(M)
    keys = jax.random.split(jax.random.PRNGKey(0), M)
    state = env.reset_to(keys, ids, jnp.zeros(M))
    lengths = motion.motion_lengths[ids]

    @jax.jit
    def rollout(physics):
        def step(carry, i):
            ph, worst, sum_d, n = carry
            t_next = (i.astype(jnp.float32) + 1.0) * dt
            ref_next = get_motion_state(
                motion, ids, jnp.minimum(t_next, lengths)
            )
            # oracle stable-PD target: the clip's own next-frame pose
            ph = jax.vmap(physics_step, in_axes=(None, 0, 0))(
                model, ph, ref_next["dof_pos"]
            )
            active = t_next <= lengths
            d = jnp.mean(
                jnp.linalg.norm(
                    ph.body_pos[:, reset_ids] - ref_next["rg_pos"][:, reset_ids],
                    axis=-1,
                ),
                axis=-1,
            )
            worst = jnp.maximum(worst, jnp.where(active, d, 0.0))
            sum_d = sum_d + jnp.where(active, d, 0.0)
            n = n + active.astype(jnp.float32)
            return (ph, worst, sum_d, n), None

        init = (physics, jnp.zeros(M), jnp.zeros(M), jnp.zeros(M))
        (ph, worst, sum_d, n), _ = jax.lax.scan(
            step, init, jnp.arange(max_steps)
        )
        return worst, sum_d / jnp.maximum(n, 1.0)

    worst, mean_d = jax.device_get(rollout(state.physics))
    out = {}
    for i, nme in enumerate(names):
        out[nme] = {
            "worst_tracked_m": round(float(worst[i]), 3),
            "mean_tracked_m": round(float(mean_d[i]), 3),
            "oracle_passes": bool(worst[i] < 0.5),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
