"""Fused physics substep — single FK, shared velocity pass, one XLA region.

The naive substep (step.py:_substep) runs refresh_kinematics (FK + a world
velocity propagation) and then ABA pass 1 recomputes the same velocities in
body frames. This fused version computes FK and the body-frame spatial
velocities once, derives contact-point world velocities from them
(v_point = R_b vl_b + w_w x arm), and feeds the same quantities to the
remaining ABA passes. Numerically identical (golden-tested in
tests/test_fused_substep.py); ~30% fewer ops per substep on the hot path.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics import spatial as sp
from pulse_tpu.physics.dynamics import spd_joint_torques
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import PhysicsState


def fused_substep(
    model: Model,
    state: PhysicsState,
    pd_target_dof: jax.Array,
    h: float,
    f_ext_extra: jax.Array | None = None,
) -> PhysicsState:
    J = model.num_bodies
    cfg = model.config
    levels = model.levels
    g = jnp.asarray([0.0, 0.0, cfg.gravity])

    q_pc = jnp.concatenate([q.quat_identity((1,)), state.joint_rot], axis=0)
    r_off = model.local_translation
    omega = jnp.concatenate([jnp.zeros((1, 3)), state.joint_omega], axis=0)

    # ---- FK + pass-1 velocities in one level sweep ------------------------ #
    rots = jnp.zeros((J, 4)).at[0].set(state.root_rot)
    poss = jnp.zeros((J, 3)).at[0].set(state.root_pos)
    v = jnp.zeros((J, 6)).at[0].set(state.root_vel6)
    for body_ids, parent_ids in levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        p_rot = rots[p]
        rots = rots.at[b].set(q.quat_mul_norm(p_rot, state.joint_rot[b - 1]))
        poss = poss.at[b].set(poss[p] + q.quat_rotate(p_rot, r_off[b]))
        vJ = jnp.concatenate([omega[b], jnp.zeros((len(b), 3))], axis=-1)
        v = v.at[b].set(sp.motion_to_child(q_pc[b], r_off[b], v[p]) + vJ)
    vJ_all = jnp.concatenate([omega, jnp.zeros((J, 3))], axis=-1)
    c_bias = sp.cross_motion(v, vJ_all)

    # world-frame velocities from the body-frame spatial velocities
    w_world = q.quat_rotate(rots, v[:, 0:3])       # [J, 3]
    vl_world = q.quat_rotate(rots, v[:, 3:6])      # velocity of body origin

    # ---- contacts (same model as contact.plane_contact_forces) ------------ #
    cb = model.cp_body
    p_w = poss[cb] + q.quat_rotate(rots[cb], model.cp_offset)
    if model.has_terrain:
        from pulse_tpu.env.terrain import terrain_height, terrain_normal

        ground_z = terrain_height(
            model.terrain_heights, model.terrain_cell, model.terrain_origin, p_w[:, 0:2]
        )
        normal = terrain_normal(
            model.terrain_heights, model.terrain_cell, model.terrain_origin, p_w[:, 0:2]
        )
    else:
        ground_z = jnp.zeros(p_w.shape[0])
        normal = jnp.zeros_like(p_w).at[:, 2].set(1.0)

    depth = model.cp_radius - (p_w[:, 2] - ground_z)
    in_contact = depth > 0.0
    arm = p_w - poss[cb]
    vp = vl_world[cb] + jnp.cross(w_world[cb], arm)
    vn = jnp.sum(vp * normal, axis=-1)
    fn = jnp.where(
        in_contact,
        jnp.maximum(cfg.contact_stiffness * depth - cfg.contact_damping * vn, 0.0),
        0.0,
    )
    fn = jnp.minimum(fn, cfg.max_contact_force)
    vt = vp - vn[:, None] * normal
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + 1e-12)
    scale = jnp.minimum(vt_norm / cfg.friction_regularization, 1.0)
    ft = -(model.cp_friction * fn * scale / vt_norm)[:, None] * vt
    f_w_pts = fn[:, None] * normal + ft
    n_w_pts = jnp.cross(arm, f_w_pts)

    f_ext = jnp.zeros((J, 6))
    f_ext = f_ext.at[cb, 0:3].add(n_w_pts)
    f_ext = f_ext.at[cb, 3:6].add(f_w_pts)
    net_contact = jnp.zeros((J, 3)).at[cb].add(f_w_pts)
    if f_ext_extra is not None:
        f_ext = f_ext + f_ext_extra
        net_contact = net_contact + f_ext_extra[:, 3:6]
    if cfg.self_collision:
        from pulse_tpu.physics.self_collision import self_collision_forces

        f_self = self_collision_forces(
            model, model.cap_p0, model.cap_p1, model.cap_r,
            poss, rots, vl_world, w_world,
        )
        f_ext = f_ext + f_self
        net_contact = net_contact + f_self[:, 3:6]

    # ---- torques ---------------------------------------------------------- #
    tau, d_extra = spd_joint_torques(model, state, pd_target_dof, h)

    # ---- bias forces ------------------------------------------------------ #
    f_grav_w = model.body_mass[:, None] * g
    com_w = q.quat_rotate(rots, model.body_com)
    n_tot = f_ext[:, 0:3] + jnp.cross(com_w, f_grav_w)
    f_tot = f_ext[:, 3:6] + f_grav_w
    f_body = sp.make(
        q.quat_rotate_inverse(rots, n_tot), q.quat_rotate_inverse(rots, f_tot)
    )
    Iv = sp.mul_inertia(model.spatial_inertia, v)
    pA = sp.cross_force(v, Iv) - f_body
    IA = model.spatial_inertia

    # ---- ABA pass 2 ------------------------------------------------------- #
    U_all = jnp.zeros((J, 6, 3))
    Dinv_all = jnp.zeros((J, 3, 3))
    u_all = jnp.zeros((J, 3))
    eye3 = jnp.eye(3)
    for body_ids, parent_ids in reversed(levels[1:]):
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        IA_b = IA[b]
        U = IA_b[:, :, 0:3]
        diag = model.joint_armature[b - 1][:, None, None] * eye3
        diag = diag + jax.vmap(jnp.diag)(d_extra[b - 1])
        D = IA_b[:, 0:3, 0:3] + diag
        Dinv = sp.inv3(D)
        u = tau[b - 1] - pA[b][:, 0:3]
        Ia = IA_b - U @ Dinv @ jnp.swapaxes(U, -1, -2)
        pa = (
            pA[b]
            + sp.mul_inertia(Ia, c_bias[b])
            + jnp.einsum("lij,lj->li", U, jnp.einsum("lij,lj->li", Dinv, u))
        )
        Ia_p = sp.inertia_to_parent(q_pc[b], r_off[b], Ia)
        pa_p = sp.force_to_parent(q_pc[b], r_off[b], pa)
        IA = IA + jax.ops.segment_sum(Ia_p, jnp.asarray(p), num_segments=J)
        pA = pA + jax.ops.segment_sum(pa_p, jnp.asarray(p), num_segments=J)
        U_all = U_all.at[b].set(U)
        Dinv_all = Dinv_all.at[b].set(Dinv)
        u_all = u_all.at[b].set(u)

    # ---- ABA pass 3 ------------------------------------------------------- #
    a = jnp.zeros((J, 6)).at[0].set(-sp.solve6_sym(IA[0], pA[0]))
    qdd = jnp.zeros((J, 3))
    for body_ids, parent_ids in levels[1:]:
        b = np.asarray(body_ids)
        p = np.asarray(parent_ids)
        a_p = sp.motion_to_child(q_pc[b], r_off[b], a[p]) + c_bias[b]
        qdd_b = jnp.einsum("lij,lj->li", Dinv_all[b], u_all[b]) - jnp.einsum(
            "lij,lj->li", Dinv_all[b], jnp.einsum("lji,lj->li", U_all[b], a_p)
        )
        a = a.at[b].set(a_p + jnp.concatenate([qdd_b, jnp.zeros((len(b), 3))], axis=-1))
        qdd = qdd.at[b].set(qdd_b)

    # ---- integrate -------------------------------------------------------- #
    root_vel6 = state.root_vel6 + h * a[0]
    joint_omega = state.joint_omega + h * qdd[1:]
    # velocity clamps (Isaac-style max velocities; guards penalty-contact blowups)
    root_vel6 = jnp.concatenate([
        jnp.clip(root_vel6[0:3], -cfg.max_angular_velocity, cfg.max_angular_velocity),
        jnp.clip(root_vel6[3:6], -cfg.max_linear_velocity, cfg.max_linear_velocity),
    ])
    joint_omega = jnp.clip(joint_omega, -cfg.max_angular_velocity, cfg.max_angular_velocity)
    root_rot = q.quat_mul_norm(state.root_rot, q.exp_map_to_quat(h * root_vel6[0:3]))
    root_pos = state.root_pos + h * q.quat_rotate(state.root_rot, root_vel6[3:6])
    joint_rot = q.quat_mul_norm(state.joint_rot, q.exp_map_to_quat(h * joint_omega))
    return state.replace(
        root_pos=root_pos,
        root_rot=root_rot,
        joint_rot=joint_rot,
        root_vel6=root_vel6,
        joint_omega=joint_omega,
        contact_force=net_contact,
    )
