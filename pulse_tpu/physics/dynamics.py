"""Featherstone articulated-body dynamics (ABA) for a floating-base tree.

This is the TPU-native replacement for PhysX's articulated solver inside
Isaac Gym (the only native component of the reference; SURVEY.md §2.9). The
algorithm is O(n) in bodies, branch-free, and written single-env: the env
layer vmaps it over thousands of humanoids so every per-body op becomes a
[num_envs, ...] batched VPU/MXU op. Topology (parents, traversal order) is
static python, unrolled at trace time — 24 bodies produce a fixed fused XLA
program with no data-dependent control flow.

Stable-PD control (Tan et al.) is folded implicitly into the joint-space
articulated inertia: tau = kp*err - (kp*h + kd)*omega with (kd*h) added to
the 3x3 joint inertia block — reproducing the robustness of Isaac Gym's
implicit DOF_MODE_POS drives (humanoid.py pre_physics_step isaac_pd path)
at large kp without tiny substeps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics import spatial as sp
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import PhysicsState


def spd_joint_torques(
    model: Model, state: PhysicsState, pd_target_dof: jax.Array, h: float
) -> tuple[jax.Array, jax.Array]:
    """Stable-PD torque (explicit part) per joint, in the child body frame.

    pd_target_dof: [D] exp-map PD targets (already offset/scaled from actions).
    Returns (tau [J-1, 3], d_extra [J-1, 3]) where d_extra is the extra
    implicit diagonal added to the joint-space inertia (SPD kd*h fold plus
    implicitly-damped limit springs — keeps stiff penalties unconditionally
    stable at the 120 Hz substep rate).
    """
    Jm1 = model.num_joints
    cfg = model.config
    target_rot = q.exp_map_to_quat(pd_target_dof.reshape(Jm1, 3))
    err = q.quat_to_exp_map(q.quat_mul_norm(q.quat_inverse(state.joint_rot), target_rot))
    kp = model.joint_kp[:, None]
    kd = model.joint_kd[:, None]
    tau = kp * err - (kp * h + kd) * state.joint_omega

    # joint-limit penalty springs (per exp-map axis, ≙ PhysX limit constraints)
    dof = q.quat_to_exp_map(state.joint_rot).reshape(-1)
    excess = jnp.maximum(dof - model.dof_upper, 0.0) + jnp.minimum(
        dof - model.dof_lower, 0.0
    )
    active = (excess != 0.0).reshape(Jm1, 3)
    limit_tau = (-cfg.limit_stiffness * excess).reshape(Jm1, 3)
    limit_tau = limit_tau - jnp.where(active, cfg.limit_damping * state.joint_omega, 0.0)

    tau = jnp.clip(tau + limit_tau, -cfg.torque_limit, cfg.torque_limit)
    d_extra = h * kd + jnp.where(
        active, h * (cfg.limit_damping + h * cfg.limit_stiffness), 0.0
    )
    return tau, d_extra


def explicit_joint_torques(
    model: Model,
    state: PhysicsState,
    tau_dof: jax.Array,
    h: float,
    passive_kd: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Direct actuation torques + joint-limit springs (no PD drive).

    Backs the reference's non-isaac_pd control modes (humanoid.py:1249-1257
    `force`, :1260-1297 explicit `pd`): the controller supplies raw per-dof
    torques; the sim still enforces joint limits (PhysX limit constraints are
    always on regardless of drive mode). `passive_kd` [J-1] is passive joint
    damping (MJCF `damping` is a joint property, not a drive gain — a
    torque-driven ragdoll still has it), folded implicitly like SPD's kd so
    it is unconditionally stable. Returns (tau [J-1,3], d_extra) in the same
    convention as spd_joint_torques so both feed aba/aba_fast.
    """
    Jm1 = model.num_joints
    cfg = model.config
    tau = tau_dof.reshape(Jm1, 3)
    d_passive = jnp.zeros((Jm1, 1))
    if passive_kd is not None:
        tau = tau - passive_kd[:, None] * state.joint_omega
        d_passive = h * passive_kd[:, None]

    dof = q.quat_to_exp_map(state.joint_rot).reshape(-1)
    excess = jnp.maximum(dof - model.dof_upper, 0.0) + jnp.minimum(
        dof - model.dof_lower, 0.0
    )
    active = (excess != 0.0).reshape(Jm1, 3)
    limit_tau = (-cfg.limit_stiffness * excess).reshape(Jm1, 3)
    limit_tau = limit_tau - jnp.where(active, cfg.limit_damping * state.joint_omega, 0.0)

    tau = jnp.clip(tau + limit_tau, -cfg.torque_limit, cfg.torque_limit)
    d_extra = d_passive + jnp.where(
        active, h * (cfg.limit_damping + h * cfg.limit_stiffness), jnp.zeros_like(tau)
    )
    return tau, d_extra


def aba(
    model: Model,
    state: PhysicsState,
    joint_tau: jax.Array,
    f_ext_world: jax.Array,
    body_rot_world: jax.Array,
    h: float,
    d_extra: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Forward dynamics: accelerations from torques and external forces.

    joint_tau:      [J-1, 3] joint torques in child body frames
    f_ext_world:    [J, 6] world-frame spatial force per body
                    (torque about the body origin, linear force)
    body_rot_world: [J, 4] world_from_body rotations (from FK)
    d_extra:        [J-1, 3] optional extra implicit diagonal for the
                    joint-space inertia (SPD/limit damping folds)
    returns (root spatial acceleration [6] in root frame, joint qdd [J-1, 3])
    """
    J = model.num_bodies
    cfg = model.config
    parents = model.parents
    g = jnp.asarray([0.0, 0.0, cfg.gravity])

    # ---- pass 1: velocities & bias terms (root -> leaves) ----------------- #
    v = [None] * J
    c_bias = [None] * J
    v[0] = state.root_vel6
    c_bias[0] = jnp.zeros(6)
    for i in range(1, J):
        p = parents[i]
        q_pc = state.joint_rot[i - 1]
        r = model.local_translation[i]
        vJ = jnp.concatenate([state.joint_omega[i - 1], jnp.zeros(3)])
        v[i] = sp.motion_to_child(q_pc, r, v[p]) + vJ
        c_bias[i] = sp.cross_motion(v[i], vJ)

    # ---- external forces in body frames (gravity + contacts) ------------- #
    p_bias = [None] * J
    for i in range(J):
        R_i = body_rot_world[i]
        f_grav_w = model.body_mass[i] * g
        com_w = q.quat_rotate(R_i, model.body_com[i])
        n_grav_w = jnp.cross(com_w, f_grav_w)
        n_w = f_ext_world[i, 0:3] + n_grav_w
        f_w = f_ext_world[i, 3:6] + f_grav_w
        f_body = sp.make(
            q.quat_rotate_inverse(R_i, n_w), q.quat_rotate_inverse(R_i, f_w)
        )
        Iv = sp.mul_inertia(model.spatial_inertia[i], v[i])
        p_bias[i] = sp.cross_force(v[i], Iv) - f_body

    # ---- pass 2: articulated inertias (leaves -> root) -------------------- #
    IA = [model.spatial_inertia[i] for i in range(J)]
    pA = list(p_bias)
    U = [None] * J
    Dinv = [None] * J
    u = [None] * J
    eye3 = jnp.eye(3)
    for i in range(J - 1, 0, -1):
        p = parents[i]
        q_pc = state.joint_rot[i - 1]
        r = model.local_translation[i]
        # ball joint: S = [I3; 0]
        U[i] = IA[i][:, 0:3]                      # [6, 3]
        diag = model.joint_armature[i - 1] * eye3
        if d_extra is not None:
            diag = diag + jnp.diag(d_extra[i - 1])
        D = IA[i][0:3, 0:3] + diag
        Dinv[i] = jnp.linalg.inv(D)
        u[i] = joint_tau[i - 1] - pA[i][0:3]
        Ia = IA[i] - U[i] @ Dinv[i] @ U[i].T
        pa = pA[i] + sp.mul_inertia(Ia, c_bias[i]) + U[i] @ (Dinv[i] @ u[i])
        IA[p] = IA[p] + sp.inertia_to_parent(q_pc, r, Ia)
        pA[p] = pA[p] + sp.force_to_parent(q_pc, r, pa)

    # ---- pass 3: accelerations (root -> leaves) --------------------------- #
    a = [None] * J
    a[0] = -jnp.linalg.solve(IA[0], pA[0])
    qdd = [None] * J
    for i in range(1, J):
        p = parents[i]
        q_pc = state.joint_rot[i - 1]
        r = model.local_translation[i]
        a_p = sp.motion_to_child(q_pc, r, a[p]) + c_bias[i]
        qdd[i] = Dinv[i] @ (u[i] - U[i].T @ a_p)
        a[i] = a_p + jnp.concatenate([qdd[i], jnp.zeros(3)])

    return a[0], jnp.stack(qdd[1:])
