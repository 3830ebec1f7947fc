"""Compile + run the Pallas mega-kernel on the real TPU and compare against
the XLA path on identical inputs. This is the check round 1 skipped (the
kernel was only ever run in interpret mode on CPU, and jnp.arccos had no
Mosaic lowering — BENCH_r01 crashed). Run me after any kernel change:

    python tools/check_pallas_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.state import state_from_kinematics
from pulse_tpu.physics.step import physics_step
from pulse_tpu.physics.substep_pallas import ENVS_PER_BLOCK, pallas_physics_step


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default="",
        choices=["", "parity", "batched", "traj", "fused", "step"],
        help="run a single check (skips the others' compiles)",
    )
    args = ap.parse_args()
    print("devices:", jax.devices())
    model = build_model(load_smpl_humanoid(), PhysicsConfig())
    B = ENVS_PER_BLOCK
    D = model.num_dof
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    root_pos = jnp.asarray([0.0, 0.0, 0.95]) + 0.1 * jax.random.normal(ks[0], (B, 3))
    root_rot = jax.random.normal(ks[1], (B, 4)) * 0.1 + jnp.asarray([0, 0, 0, 1.0])
    dof = 0.3 * jax.random.normal(ks[2], (B, D))
    root_vel = 0.5 * jax.random.normal(ks[3], (B, 3))
    root_ang = 0.5 * jax.random.normal(ks[4], (B, 3))
    dof_vel = 0.5 * jax.random.normal(ks[5], (B, D))
    state = jax.vmap(state_from_kinematics, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        model, root_pos, root_rot, dof, root_vel, root_ang, dof_vel
    )
    pd = 0.2 * jax.random.normal(ks[6], (B, D))

    if args.only == "batched":
        batched_model_check(model, state, pd)
        return
    if args.only == "traj":
        trajectory_divergence(model, state)
        return
    if args.only == "fused":
        fused_finish_check(model)
        return
    if args.only == "step":
        step_fused_check(model)
        return

    print("compiling pallas kernel on", jax.devices()[0].platform, "...")
    out = jax.jit(lambda s, a: pallas_physics_step(model, s, a))(state, pd)
    jax.block_until_ready(out)
    print("pallas kernel compiled and ran: OK")

    ref = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(model, state, pd)
    jax.block_until_ready(ref)

    # Tolerances = ~2x the envelope measured on v5e (round 3): stiff penalty
    # contacts amplify Mosaic-vs-XLA transcendental rounding (~1e-6 base) in
    # the few envs at force saturation; the medians are the semantic check.
    # Measured: root_pos 2.7e-3/4.2e-5, root_rot 5.1e-3/1.3e-4, body_pos
    # 9.2e-3/1.9e-4, body_vel 6.5e-1/6.2e-3, contact_force 5.9e1/0 (max/med).
    checks = {
        "root_pos": (6e-3, 2e-4),
        "root_rot": (1e-2, 5e-4),
        "body_pos": (2e-2, 8e-4),
        "body_vel": (1.3, 2e-2),
        "contact_force": (120.0, 0.5),
    }
    for name, (max_tol, med_tol) in checks.items():
        a = np.asarray(getattr(out, name))
        b = np.asarray(getattr(ref, name))
        d = np.abs(a - b).reshape(B, -1).max(axis=1)
        print(f"  {name:14s} max|diff| = {d.max():.3e}  median = {np.median(d):.3e}")
        assert d.max() < max_tol, f"{name} max diverged on TPU: {d.max()}"
        assert np.median(d) < med_tol, f"{name} median diverged: {np.median(d)}"
    print("pallas TPU vs XLA parity: OK")

    # the shard_map'd path (DP mesh composition, incl. the non-tile-multiple
    # padding) with the real Mosaic lowering — a 1-device mesh exercises the
    # same manual-sharding lowering the multi-chip mesh uses
    from jax.sharding import Mesh
    from pulse_tpu.physics.substep_pallas import sharded_pallas_physics_step

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("data",))
    Bs = 384  # per-chip shard size at 3072 envs / 8 chips — needs padding
    st = jax.tree.map(lambda x: x[:Bs], state)
    out_s = jax.jit(
        lambda s, p: sharded_pallas_physics_step(model, mesh, s, p)
    )(st, pd[:Bs])
    jax.block_until_ready(out_s)
    err = float(
        np.max(np.abs(np.asarray(out_s.root_pos) - np.asarray(out.root_pos)[:Bs]))
    )
    assert err < 1e-6, f"sharded vs plain kernel mismatch: {err}"
    print("pallas shard_map path on TPU: OK")
    if args.only == "parity":
        return

    batched_model_check(model, state, pd)
    trajectory_divergence(model, state)
    fused_finish_check(model)
    step_fused_check(model)


def batched_model_check(model, state, pd):
    """Shape-varied batch through the kernel's model-rows path on the real
    TPU (round-3 VERDICT missing #5 / next #8): per-env masses/inertias/
    gains/limits/contact geometry enter as block inputs; parity against the
    per-env-vmapped XLA step on the SAME varied models."""
    from pulse_tpu.physics.shape_variation import vary_model_scales
    from pulse_tpu.physics.substep_pallas import build_model_rows

    B = state.root_pos.shape[0]
    bm = vary_model_scales(model, jax.random.PRNGKey(11), B, (0.9, 1.1))
    rows = build_model_rows(bm, B)
    print(f"compiling batched-model kernel (model rows {rows.shape}) ...")
    out = jax.jit(
        lambda s, a, r: pallas_physics_step(model, s, a, model_rows=r)
    )(state, pd, rows)
    jax.block_until_ready(out)
    ref = jax.jit(jax.vmap(physics_step, in_axes=(0, 0, 0)))(bm, state, pd)
    jax.block_until_ready(ref)
    # Medians must hold the SAME envelope as the homogeneous-model check
    # (measured: root_pos 4.5e-5, root_rot 1.4e-4 — identical); the max
    # tolerances are ~2x the measured heterogeneous tail, which is wider
    # than the homogeneous one (per-env scale diversity changes which envs
    # sit at contact-force saturation, where Mosaic-vs-XLA rounding is
    # chaos-amplified; measured maxes: root_pos 2.6e-3, root_rot 2.6e-2).
    # The toy-chain interpret check agrees to 1e-8 without contacts.
    checks = {
        "root_pos": (6e-3, 2e-4),
        "root_rot": (6e-2, 5e-4),
        "body_pos": (8e-2, 8e-4),
        "body_vel": (4.0, 2e-2),
        "contact_force": (240.0, 0.5),
    }
    for name, (max_tol, med_tol) in checks.items():
        a = np.asarray(getattr(out, name))
        b = np.asarray(getattr(ref, name))
        d = np.abs(a - b).reshape(B, -1).max(axis=1)
        n_out = int((d >= max_tol).sum())
        print(
            f"  [shape-varied] {name:14s} max|diff| = {d.max():.3e}"
            f"  median = {np.median(d):.3e}  outliers = {n_out}/{B}"
        )
        if name == "contact_force":
            # Contact forces are DISCONTINUOUS in the state: an env whose
            # contact sits exactly at the activation/saturation knife edge
            # can flip on/off between the Mosaic and XLA roundings, giving
            # an O(force-scale) diff in that env alone (observed: max
            # exactly 500.0 N with median 0 in 1/1024 envs). Allow isolated
            # flips — bound the outlier COUNT, not the max — while the
            # median still pins the bulk.
            assert n_out <= max(2, B // 256), (
                f"batched {name}: {n_out}/{B} envs exceed {max_tol} — "
                "contact divergence is not an isolated knife-edge flip"
            )
        else:
            assert d.max() < max_tol, f"batched {name} max diverged: {d.max()}"
        assert np.median(d) < med_tol, f"batched {name} median diverged: {np.median(d)}"
    print("pallas batched-model (shape variation) path on TPU: OK")


def fused_finish_check(model, B: int = 1024):
    """Compile + run the two env/pallas_obs.py kernels on the real TPU and
    compare the fused post-physics path against the per-env XLA
    _finish_step on identical physics outputs (the on-device counterpart of
    tests/test_pallas_obs.py — catches Mosaic lowering gaps, e.g. jnp.exp)."""
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.motion import build_motion_data
    from pulse_tpu.motion.synthetic import make_synthetic_clips

    tree = load_smpl_humanoid().skeleton
    clips = make_synthetic_clips(tree, num_clips=2, seconds=1.0)
    motion = build_motion_data(tree, clips)
    env = HumanoidImEnv(model, motion, EnvConfig())
    assert env._fused_step_ok()

    keys = jax.random.split(jax.random.PRNGKey(5), B)
    states = env.reset(keys)
    actions = 0.5 * jax.random.normal(jax.random.PRNGKey(6), (B, env.action_dim))
    pd = env.action_to_pd_target(actions)
    physics = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(
        model, states.physics, pd
    )
    print("compiling fused obs/reward kernels on TPU ...")
    got = jax.jit(env._finish_step_fused)(states, physics)
    jax.block_until_ready(got.obs)
    want = jax.jit(
        jax.vmap(lambda s, p, t: env._finish_step(s, p, t, model))
    )(states, physics, pd)
    for name, a, b, tol in [
        ("reward", got.reward, want.reward, 1e-4),
        ("obs", got.obs, want.obs, 5e-4),
        ("amp_row", got.amp_hist[:, 0], want.amp_hist[:, 0], 5e-4),
    ]:
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        print(f"  fused {name:8s} max|diff| = {d:.3e}")
        assert d < tol, f"fused {name} diverged on TPU: {d}"
    assert bool(np.array_equal(np.asarray(got.done), np.asarray(want.done)))
    print("fused post-physics path on TPU: OK")


def step_fused_check(model, B: int = 1024):
    """The one-launch hot path (env.step -> pallas_step_reward_amp: physics
    + reward/AMP in a single kernel) vs the two-launch composition (physics
    kernel, then the standalone reward/AMP kernel via _finish_step_fused)
    on identical inputs. The two traces run the same tile ops in the same
    order, so this pins the `extra`-hook plumbing, not numerics."""
    from pulse_tpu.env import EnvConfig, HumanoidImEnv
    from pulse_tpu.motion import build_motion_data
    from pulse_tpu.motion.synthetic import make_synthetic_clips
    from pulse_tpu.physics.substep_pallas import pallas_physics_step as pstep

    tree = load_smpl_humanoid().skeleton
    clips = make_synthetic_clips(tree, num_clips=2, seconds=1.0)
    motion = build_motion_data(tree, clips)
    env = HumanoidImEnv(model, motion, EnvConfig())
    assert env._fused_step_ok()

    keys = jax.random.split(jax.random.PRNGKey(7), B)
    states = env.reset(keys)
    actions = 0.5 * jax.random.normal(jax.random.PRNGKey(8), (B, env.action_dim))

    print("compiling one-launch step kernel on TPU ...")
    got = jax.jit(env.step)(states, actions)
    jax.block_until_ready(got.obs)

    def two_launch(states, actions):
        acts = jax.vmap(env._dr_action_noise)(states, actions)
        acts = jax.vmap(env.motor_actions_one)(states, acts)
        pd = env.action_to_pd_target(acts, env.model)
        physics = pstep(env.model, states.physics, pd)
        return env._finish_step_fused(states, physics)

    want = jax.jit(two_launch)(states, actions)
    jax.block_until_ready(want.obs)
    for name, a, b, tol in [
        ("root_pos", got.physics.root_pos, want.physics.root_pos, 1e-5),
        ("reward", got.reward, want.reward, 1e-5),
        ("obs", got.obs, want.obs, 1e-4),
        ("amp_row", got.amp_hist[:, 0], want.amp_hist[:, 0], 1e-4),
    ]:
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        print(f"  one-launch {name:8s} max|diff| = {d:.3e}")
        assert d < tol, f"one-launch step {name} diverged on TPU: {d}"
    assert bool(np.array_equal(np.asarray(got.done), np.asarray(want.done)))
    print("one-launch step path on TPU: OK")


def trajectory_divergence(model, state, T: int = 90):
    """N-step free-rollout divergence: step the SAME initial states through
    the Pallas kernel and the XLA path for T control steps (3 s) under
    constant PD targets and report body_pos drift percentiles over time.

    Chaotic contact dynamics amplify any numeric difference exponentially,
    so some long-horizon drift is expected even between two bit-different
    but equally-valid integrators (the reference's PhysX sim is not
    bit-stable across GPU generations either); what matters is that the
    drift grows smoothly from rounding (no step change = no semantic bug)
    and that TRAINING through either path reaches the same quality
    (tools/bench_quality.py --pallas on|off A/B)."""
    B = state.root_pos.shape[0]
    pd0 = jnp.zeros((B, model.num_dof))

    step_k = jax.jit(lambda s: pallas_physics_step(model, s, pd0))
    step_x = jax.jit(lambda s: jax.vmap(physics_step, in_axes=(None, 0, 0))(model, s, pd0))

    sk = sx = state
    print(f"trajectory divergence over {T} steps (body_pos, m):")
    checkpoints = {int(T * f) for f in (0.1, 0.33, 0.66, 1.0)}
    for i in range(1, T + 1):
        sk = step_k(sk)
        sx = step_x(sx)
        if i in checkpoints:
            d = np.linalg.norm(
                np.asarray(sk.body_pos) - np.asarray(sx.body_pos), axis=-1
            ).max(axis=-1)  # per-env max-joint drift
            print(
                f"  t={i:3d}: median={np.median(d):.3e}  p90={np.percentile(d, 90):.3e}"
                f"  max={d.max():.3e}"
            )
    # both paths must stay physical (no NaN blowup)
    assert np.isfinite(np.asarray(sk.body_pos)).all()
    assert np.isfinite(np.asarray(sx.body_pos)).all()
    print("trajectory rollouts finite on both paths: OK")


if __name__ == "__main__":
    main()
