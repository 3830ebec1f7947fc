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

    Level-parallel: each tree depth is one batched gather+compose step
    (9 levels for the SMPL humanoid instead of 24 sequential bodies)."""


    J = model.num_bodies
    rots = jnp.zeros((J, 4)).at[0].set(root_rot)
    poss = jnp.zeros((J, 3)).at[0].set(root_pos)
    for body_ids, parent_ids in model.levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        p_rot = rots[p]
        rots = rots.at[b].set(q.quat_mul_norm(p_rot, joint_rot[b - 1]))
        poss = poss.at[b].set(
            poss[p] + q.quat_rotate(p_rot, model.local_translation[b])
        )
    return rots, poss


def refresh_kinematics(model: Model, state: PhysicsState) -> PhysicsState:
    """Recompute derived world-frame body states from generalized coords."""


    body_rot, body_pos = _fk_world(model, state.root_pos, state.root_rot, state.joint_rot)

    J = model.num_bodies
    w = jnp.zeros((J, 3)).at[0].set(q.quat_rotate(state.root_rot, state.root_vel6[0:3]))
    v = jnp.zeros((J, 3)).at[0].set(q.quat_rotate(state.root_rot, state.root_vel6[3:6]))
    for body_ids, parent_ids in model.levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        r = body_pos[b] - body_pos[p]
        v = v.at[b].set(v[p] + jnp.cross(w[p], r))
        w = w.at[b].set(w[p] + q.quat_rotate(body_rot[b], state.joint_omega[b - 1]))
    return state.replace(
        body_pos=body_pos,
        body_rot=body_rot,
        body_vel=v,
        body_ang_vel=w,
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
