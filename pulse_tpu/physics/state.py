"""Physics state: generalized coordinates for one humanoid (vmap over envs).

Layout
------
root_pos   [3]      world position of the root body frame
root_rot   [4]      world_from_root rotation, xyzw
joint_rot  [J-1,4]  parent_from_child ball-joint rotations
root_vel6  [6]      root spatial velocity in the ROOT BODY frame (ang, lin)
joint_omega[J-1,3]  joint angular velocities in the child body frame

Derived world-frame quantities (body positions/rotations/velocities, net
contact force) are recomputed each step and carried in the state so the env
layer never re-runs FK — mirroring Isaac Gym's refreshed rigid-body state
tensors (humanoid.py:1121-1130) but as pure values.

The external dof representation is exp-map triplets, matching the reference's
treatment of SMPL joints (humanoid.py:1436-1446); the internal quaternion
parameterization avoids exp-map singularities during integration.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.ops import quat as q
from pulse_tpu.physics.model import Model


@struct.dataclass
class PhysicsState:
    # generalized coordinates
    root_pos: jax.Array
    root_rot: jax.Array
    joint_rot: jax.Array
    root_vel6: jax.Array
    joint_omega: jax.Array

    # derived, world frame (refreshed by physics_step / refresh_kinematics)
    body_pos: jax.Array        # [J, 3]
    body_rot: jax.Array        # [J, 4]
    body_vel: jax.Array        # [J, 3]  linear vel of body frame origin
    body_ang_vel: jax.Array    # [J, 3]
    contact_force: jax.Array   # [J, 3]  net world contact force per body


def _fk_world(model: Model, root_pos, root_rot, joint_rot):
    """World rotations/positions of all bodies from generalized coords.

    Level-parallel and scatter-free: per-level arrays with static gathers
    from the previous level, one concatenate + inverse permutation at the
    end (parents always live exactly one level up)."""
    from pulse_tpu.physics.substep_lp import _level_meta

    meta = _level_meta(model.levels, model.num_bodies)
    jr = joint_rot[meta["perm_j"]]
    lt = model.local_translation[meta["perm_j"] + 1]
    starts = meta["starts"]

    rot_lv = [root_rot[None]]
    pos_lv = [root_pos[None]]
    for l in range(1, len(meta["body_ids"])):
        pl = meta["parent_local"][l]
        s = starts[l] - 1
        e = s + meta["sizes"][l]
        p_rot = rot_lv[l - 1][pl]
        rot_lv.append(q.quat_mul_norm(p_rot, jr[s:e]))
        pos_lv.append(pos_lv[l - 1][pl] + q.quat_rotate(p_rot, lt[s:e]))
    inv = meta["inv_perm_b"]
    return jnp.concatenate(rot_lv)[inv], jnp.concatenate(pos_lv)[inv]


def refresh_kinematics(model: Model, state: PhysicsState) -> PhysicsState:
    """Recompute derived world-frame body states from generalized coords."""
    from pulse_tpu.physics.substep_lp import _level_meta

    meta = _level_meta(model.levels, model.num_bodies)
    jr = state.joint_rot[meta["perm_j"]]
    lt = model.local_translation[meta["perm_j"] + 1]
    om = state.joint_omega[meta["perm_j"]]
    starts = meta["starts"]

    rot_lv = [state.root_rot[None]]
    pos_lv = [state.root_pos[None]]
    w_lv = [q.quat_rotate(state.root_rot, state.root_vel6[0:3])[None]]
    v_lv = [q.quat_rotate(state.root_rot, state.root_vel6[3:6])[None]]
    for l in range(1, len(meta["body_ids"])):
        pl = meta["parent_local"][l]
        s = starts[l] - 1
        e = s + meta["sizes"][l]
        p_rot = rot_lv[l - 1][pl]
        p_pos = pos_lv[l - 1][pl]
        rot_l = q.quat_mul_norm(p_rot, jr[s:e])
        pos_l = p_pos + q.quat_rotate(p_rot, lt[s:e])
        r = pos_l - p_pos
        v_lv.append(v_lv[l - 1][pl] + jnp.cross(w_lv[l - 1][pl], r))
        w_lv.append(w_lv[l - 1][pl] + q.quat_rotate(rot_l, om[s:e]))
        rot_lv.append(rot_l)
        pos_lv.append(pos_l)
    inv = meta["inv_perm_b"]
    return state.replace(
        body_pos=jnp.concatenate(pos_lv)[inv],
        body_rot=jnp.concatenate(rot_lv)[inv],
        body_vel=jnp.concatenate(v_lv)[inv],
        body_ang_vel=jnp.concatenate(w_lv)[inv],
    )


def state_from_kinematics(
    model: Model,
    root_pos: jax.Array,
    root_rot: jax.Array,
    dof_pos: jax.Array,
    root_vel: jax.Array,
    root_ang_vel: jax.Array,
    dof_vel: jax.Array,
) -> PhysicsState:
    """Build a state from motion-lib style quantities (world-frame root
    velocities, exp-map dof) — the reset path (≙ _set_env_state,
    humanoid_amp.py:565-597)."""
    Jm1 = model.num_joints
    joint_rot = q.exp_map_to_quat(dof_pos.reshape(Jm1, 3))
    root_vel6 = jnp.concatenate(
        [
            q.quat_rotate_inverse(root_rot, root_ang_vel),
            q.quat_rotate_inverse(root_rot, root_vel),
        ]
    )
    state = PhysicsState(
        root_pos=root_pos,
        root_rot=q.quat_unit(root_rot),
        joint_rot=joint_rot,
        root_vel6=root_vel6,
        joint_omega=dof_vel.reshape(Jm1, 3),
        body_pos=jnp.zeros((model.num_bodies, 3)),
        body_rot=jnp.zeros((model.num_bodies, 4)).at[:, 3].set(1.0),
        body_vel=jnp.zeros((model.num_bodies, 3)),
        body_ang_vel=jnp.zeros((model.num_bodies, 3)),
        contact_force=jnp.zeros((model.num_bodies, 3)),
    )
    return refresh_kinematics(model, state)


def state_from_motion_ref(model: Model, ref: dict) -> PhysicsState:
    """Build a reset state DIRECTLY from a motion-lib state dict — zero FK.

    The motion tables already hold the FK'd global body poses and the
    smoothed body velocities (built by the same forward_kinematics at load
    time), so re-running FK per auto-reset (state_from_kinematics ->
    refresh_kinematics) was pure waste: disabling the in-step reset showed
    it costing ~half the env step on TPU (1.29M -> 2.61M steps/s). Using
    the table velocities verbatim also matches the reference MORE closely —
    its reset writes cached rigid-body states from the motion directly
    (_set_env_state rb workaround, humanoid_amp.py:565-597)."""
    Jm1 = model.num_joints
    root_rot = q.quat_unit(ref["root_rot"])
    root_vel6 = jnp.concatenate(
        [
            q.quat_rotate_inverse(root_rot, ref["root_ang_vel"]),
            q.quat_rotate_inverse(root_rot, ref["root_vel"]),
        ]
    )
    return PhysicsState(
        root_pos=ref["root_pos"],
        root_rot=root_rot,
        joint_rot=ref["local_rot"][1:],
        root_vel6=root_vel6,
        joint_omega=ref["dof_vel"].reshape(Jm1, 3),
        body_pos=ref["rg_pos"],
        body_rot=ref["rb_rot"],
        body_vel=ref["body_vel"],
        body_ang_vel=ref["body_ang_vel"],
        contact_force=jnp.zeros((model.num_bodies, 3)),
    )


def default_state(model: Model, height: float = 0.95) -> PhysicsState:
    """T-pose standing at the given pelvis height."""
    D = model.num_dof
    return state_from_kinematics(
        model,
        jnp.asarray([0.0, 0.0, height]),
        jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        jnp.zeros(D),
        jnp.zeros(3),
        jnp.zeros(3),
        jnp.zeros(D),
    )


def dof_pos_from_state(state: PhysicsState) -> jax.Array:
    """[D] exp-map dof positions."""
    return q.quat_to_exp_map(state.joint_rot).reshape(-1)


def dof_vel_from_state(state: PhysicsState) -> jax.Array:
    """[D] local joint angular velocities."""
    return state.joint_omega.reshape(-1)
