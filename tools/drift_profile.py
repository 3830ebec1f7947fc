"""Per-step drift profile of a trained policy on selected clips.

im_eval's success criterion is "mean tracked-body drift never exceeds
0.5 m" (≙ the reference's termination_distance check over the whole clip,
phc/learning/im_amp.py:300-330) — a clip can fail on ONE transient spike
while its episode-mean MPJPE stays low (hard-suite crouch_walk sits at
~80 mm mean yet fails). This prints the drift timeseries so the failure
mode (start-state jolt / mid-clip stumble / end-of-clip drift) is visible.

Usage:
  python tools/drift_profile.py --snapshot output/curriculum/col2.pkl \
      [--clips crouch_walk getup_supine] [--suite hard]
"""

import argparse
import os
import pickle
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
    ap.add_argument("--snapshot", required=True)
    ap.add_argument("--suite", choices=["hard", "easy"], default="hard")
    ap.add_argument("--clips", nargs="*", default=None)
    ap.add_argument("--bins", type=int, default=24,
                    help="time bins for the printed profile")
    ap.add_argument(
        "--pallas", choices=["on", "off"],
        default="off" if os.environ.get("PULSE_PLATFORM") == "cpu" else "on",
        help="Pallas physics path (interpret-mode on CPU costs minutes per "
        "kernel call, so default off under PULSE_PLATFORM=cpu)")
    args = ap.parse_args()

    import dataclasses as dc

    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.learning.networks import ActorCritic
    from pulse_tpu.motion import build_motion_data, make_synthetic_clips
    from pulse_tpu.motion.synthetic import make_hard_clips
    from pulse_tpu.physics import PhysicsConfig, build_model

    spec = load_smpl_humanoid()
    model = build_model(spec, PhysicsConfig())
    if args.suite == "hard":
        clips, names = make_hard_clips(spec.skeleton)
    else:
        clips = make_synthetic_clips(spec.skeleton, num_clips=4)
        names = [f"easy_{i}" for i in range(len(clips))]
    motion = build_motion_data(spec.skeleton, clips)
    env = HumanoidImEnv(
        model, motion,
        EnvConfig(enable_early_termination=False,
                  use_pallas_physics=(args.pallas == "on")),
    )
    M = motion.num_motions

    with open(args.snapshot, "rb") as fh:
        saved = pickle.load(fh)
    params = jax.tree.map(jnp.asarray, saved["params"])
    mean = jnp.asarray(saved["rms_mean"])
    var = jnp.asarray(saved["rms_var"])
    net = ActorCritic(action_dim=env.action_dim)

    def policy(obs):
        x = jnp.clip((obs - mean) / jnp.sqrt(var + 1e-5), -5.0, 5.0)
        mu, _, _ = net.apply({"params": params}, x)
        return jnp.clip(mu, -1.0, 1.0)

    from pulse_tpu.motion.motion_lib import get_motion_state

    track_ids = jnp.asarray(env.reset_body_ids)
    dt = model.config.control_dt
    steps = int(np.ceil(float(jnp.max(motion.motion_lengths)) / dt))
    motion_ids = jnp.arange(M)

    def rollout(key):
        # one env per clip, deterministic start at t=0 (im_eval's sweep)
        state = env.reset_to(
            jax.random.split(key, M), motion_ids, jnp.zeros(M)
        )

        def step(state, i):
            nxt = env.step(state, policy(state.obs))
            t = jnp.broadcast_to((i.astype(jnp.float32) + 1.0) * dt, (M,))
            ref = get_motion_state(motion, motion_ids, t)
            drift = jnp.linalg.norm(
                nxt.physics.body_pos[:, track_ids]
                - ref["rg_pos"][:, track_ids],
                axis=-1,
            ).mean(-1)
            return nxt, drift

        _, drifts = jax.lax.scan(step, state, jnp.arange(steps))
        return drifts  # [T, M]

    drifts = np.asarray(jax.jit(rollout)(jax.random.PRNGKey(0)))
    sel = (
        range(M)
        if not args.clips
        else [names.index(c) for c in args.clips]
    )
    for i in sel:
        T = int(np.ceil(float(motion.motion_lengths[i]) / dt))
        # score only pre-reset steps, matching im_eval: step i's post-step
        # clock is (i+1)*dt, and the env auto-resets (RSI) once it reaches
        # the clip length — that state is a fresh reset, not policy drift
        length = float(motion.motion_lengths[i])
        n_active = int(np.sum((np.arange(T) + 1.0) * float(dt) < length))
        d = drifts[:max(n_active, 1), i]
        peak_t = int(np.argmax(d))
        Ta = len(d)
        print(
            f"{names[i]}: peak {d.max():.3f} m @ step {peak_t}/{Ta} "
            f"({peak_t / Ta * 100:.0f}%), mean {d.mean():.3f} m, "
            f"frac>0.5m {np.mean(d > 0.5):.2f}"
        )
        B = args.bins
        edges = np.linspace(0, Ta, B + 1).astype(int)
        prof = [d[a:b].max() if b > a else 0.0 for a, b in zip(edges, edges[1:])]
        bar = "".join(
            "#" if p > 0.5 else ("+" if p > 0.25 else ".") for p in prof
        )
        print(f"  max-per-bin [{bar}]  (#>0.5m +>0.25m)")


if __name__ == "__main__":
    main()
