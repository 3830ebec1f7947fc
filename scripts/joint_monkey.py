"""Asset / DOF inspection: print the humanoid's bodies, joints, limits,
masses, and geoms, and sweep every DOF through its range kinematically.

≙ scripts/joint_monkey_smpl.py (the reference's Isaac Gym asset-inspection
demo) re-imagined headless: the textual dump replaces the property panel,
and the DOF sweep animation is dumped as FK body positions (.npz; render
with scripts/play_motion.py's stick-figure pipeline or your own tooling).

Usage:
  python scripts/joint_monkey.py                # print the asset table
  JAX_PLATFORMS=cpu python scripts/joint_monkey.py --sweep out.npz
(the sweep is host-side FK — run it on CPU so it doesn't grab the TPU)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def print_asset(spec):
    tree = spec.skeleton
    print(f"bodies: {spec.num_bodies}  joints: {spec.num_joints}  dof: {spec.num_dof}")
    print(f"total mass: {spec.body_mass.sum():.2f} kg")
    print(f"{'body':<12} {'parent':<12} {'mass':>7} {'offset':>24}")
    for i, name in enumerate(tree.node_names):
        p = int(tree.parent_indices[i])
        parent = tree.node_names[p] if p >= 0 else "-"
        off = np.array2string(
            np.asarray(tree.local_translation[i]), precision=3, suppress_small=True
        )
        print(f"{name:<12} {parent:<12} {spec.body_mass[i]:>7.3f} {off:>24}")
    print(f"\n{'joint':<12} {'axis':>4} {'lower':>8} {'upper':>8} {'kp':>8} {'kd':>7}")
    for j, name in enumerate(tree.node_names[1:]):
        for a, ax in enumerate("xyz"):
            d = 3 * j + a
            print(
                f"{name if a == 0 else '':<12} {ax:>4} "
                f"{spec.dof_lower[d]:>8.3f} {spec.dof_upper[d]:>8.3f} "
                f"{spec.joint_stiffness[j]:>8.1f} {spec.joint_damping[j]:>7.1f}"
            )


def sweep_dofs(spec, frames_per_dof: int, out: str):
    """Animate each DOF lower->upper->rest through FK (the joint_monkey
    sweep), dumping [T, J, 3] global positions."""
    import jax.numpy as jnp

    from pulse_tpu.kinematics.skeleton import forward_kinematics
    from pulse_tpu.ops import quat as q

    D = spec.num_dof
    T = D * frames_per_dof
    dof = np.zeros((T, D), np.float32)
    for d in range(D):
        lo, hi = float(spec.dof_lower[d]), float(spec.dof_upper[d])
        phase = np.linspace(0, 2 * np.pi, frames_per_dof, endpoint=False)
        mid, amp = 0.5 * (hi + lo), 0.5 * (hi - lo)
        dof[d * frames_per_dof : (d + 1) * frames_per_dof, d] = mid + amp * np.sin(phase)
    em = jnp.asarray(dof).reshape(T, -1, 3)
    local = jnp.concatenate(
        [jnp.tile(jnp.asarray([0, 0, 0, 1.0]), (T, 1, 1)), q.exp_map_to_quat(em)],
        axis=1,
    )
    root_t = jnp.tile(jnp.asarray([0.0, 0.0, 0.95]), (T, 1))
    g_rot, g_pos = forward_kinematics(spec.skeleton, local, root_t)
    np.savez_compressed(
        out,
        body_pos=np.asarray(g_pos),
        body_rot=np.asarray(g_rot),
        fps=30.0,
        names=np.asarray(spec.skeleton.node_names),
    )
    print(f"wrote {T} sweep frames -> {out}")


def main():
    from pulse_tpu.assets import load_smpl_humanoid

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="")
    ap.add_argument("--frames-per-dof", type=int, default=20)
    args = ap.parse_args()
    spec = load_smpl_humanoid()
    print_asset(spec)
    if args.sweep:
        sweep_dofs(spec, args.frames_per_dof, args.sweep)


if __name__ == "__main__":
    main()
