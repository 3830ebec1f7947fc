"""Ground-plane contact: compliant normal + regularized Coulomb friction.

Branch-free narrowphase over a fixed set of per-geom proxy points (sphere
centers, capsule endpoints, box corners — Model.cp_*), masked by penetration.
This replaces PhysX's TGS contact solve for robot-vs-ground; the compliant
model at the 120 Hz substep rate reproduces the same standing/walking
behavior while staying a pure fused elementwise kernel. Self-collision and
terrain heightfields extend this module (same point set, different height
query).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics.model import Model


def plane_contact_forces(
    model: Model,
    body_pos: jax.Array,
    body_rot: jax.Array,
    body_vel: jax.Array,
    body_ang_vel: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """World-frame contact spatial forces per body.

    Returns (f_ext [J, 6] = (torque about body origin, force),
             net_contact_force [J, 3]) — the latter feeds fall termination
    (≙ contact_buf, humanoid.py:1572-1608).
    """
    cfg = model.config
    b = model.cp_body
    p = body_pos[b] + q.quat_rotate(body_rot[b], model.cp_offset)   # [P, 3]

    if model.has_terrain:
        from pulse_tpu.env.terrain import terrain_height, terrain_normal

        ground_z = terrain_height(
            model.terrain_heights, model.terrain_cell, model.terrain_origin, p[:, 0:2]
        )
        normal = terrain_normal(
            model.terrain_heights, model.terrain_cell, model.terrain_origin, p[:, 0:2]
        )
    else:
        ground_z = jnp.zeros(p.shape[0])
        normal = jnp.zeros_like(p).at[:, 2].set(1.0)

    depth = model.cp_radius - (p[:, 2] - ground_z)                  # >0 penetrating
    in_contact = depth > 0.0

    arm = p - body_pos[b]
    vp = body_vel[b] + jnp.cross(body_ang_vel[b], arm)              # point velocity
    vn = jnp.sum(vp * normal, axis=-1)
    fn = jnp.where(
        in_contact,
        jnp.maximum(cfg.contact_stiffness * depth - cfg.contact_damping * vn, 0.0),
        0.0,
    )
    fn = jnp.minimum(fn, cfg.max_contact_force)

    vt = vp - vn[:, None] * normal                                  # tangential
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    # smooth Coulomb: full mu*fn beyond the regularization velocity scale
    scale = jnp.minimum(vt_norm / cfg.friction_regularization, 1.0)
    ft = -(model.cp_friction * fn * scale / vt_norm)[:, None] * vt

    f_w = fn[:, None] * normal + ft                                 # [P, 3]
    n_w = jnp.cross(arm, f_w)

    J = model.num_bodies
    f_ext = jnp.zeros((J, 6))
    f_ext = f_ext.at[b, 0:3].add(n_w)
    f_ext = f_ext.at[b, 3:6].add(f_w)
    net = jnp.zeros((J, 3)).at[b].add(f_w)
    return f_ext, net
