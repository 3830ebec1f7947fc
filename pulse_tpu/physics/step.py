"""Semi-implicit integration loop: one control step = substeps * control_freq_inv
inner physics steps (≙ Isaac's simulate loop, humanoid.py:1282-1297, with
dt=1/60, 2 substeps, control_freq_inv=2 -> 120 Hz inner rate).

Single-env; the env layer vmaps. The inner loop is a python unroll (4 static
iterations) so XLA fuses the whole control step — FK, contacts, ABA,
integration — into one program with zero host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.physics import spatial as sp
from pulse_tpu.physics.aba_fast import aba_fast
from pulse_tpu.physics.contact import plane_contact_forces
from pulse_tpu.physics.dynamics import explicit_joint_torques, spd_joint_torques
from pulse_tpu.physics.model import Model
from pulse_tpu.physics.state import PhysicsState, refresh_kinematics


def _substep(
    model: Model,
    state: PhysicsState,
    pd_target_dof: jax.Array,
    h: float,
    f_ext_extra: jax.Array | None = None,
    tau_dof: jax.Array | None = None,
    passive_kd: jax.Array | None = None,
):
    # world kinematics for contacts + force frames
    cfg = model.config
    state = refresh_kinematics(model, state)
    f_ext, net_contact = plane_contact_forces(
        model, state.body_pos, state.body_rot, state.body_vel, state.body_ang_vel
    )
    if f_ext_extra is not None:
        f_ext = f_ext + f_ext_extra
        net_contact = net_contact + f_ext_extra[:, 3:6]
    if tau_dof is not None:
        tau, d_extra = explicit_joint_torques(
            model, state, tau_dof, h, passive_kd=passive_kd
        )
    else:
        tau, d_extra = spd_joint_torques(model, state, pd_target_dof, h)
    a0, qdd = aba_fast(model, state, tau, f_ext, state.body_rot, h, d_extra)

    # semi-implicit Euler: velocities first, then positions
    root_vel6 = state.root_vel6 + h * a0
    joint_omega = state.joint_omega + h * qdd
    # velocity clamps (Isaac-style max velocities; guards penalty-contact blowups)
    root_vel6 = jnp.concatenate([
        jnp.clip(root_vel6[0:3], -cfg.max_angular_velocity, cfg.max_angular_velocity),
        jnp.clip(root_vel6[3:6], -cfg.max_linear_velocity, cfg.max_linear_velocity),
    ])
    joint_omega = jnp.clip(joint_omega, -cfg.max_angular_velocity, cfg.max_angular_velocity)

    root_rot = q.quat_mul_norm(
        state.root_rot, q.exp_map_to_quat(h * root_vel6[0:3])
    )
    root_pos = state.root_pos + h * q.quat_rotate(state.root_rot, root_vel6[3:6])
    joint_rot = q.quat_mul_norm(
        state.joint_rot, q.exp_map_to_quat(h * joint_omega)
    )
    return state.replace(
        root_pos=root_pos,
        root_rot=root_rot,
        joint_rot=joint_rot,
        root_vel6=root_vel6,
        joint_omega=joint_omega,
        contact_force=net_contact,
    )


def physics_step(
    model: Model, state: PhysicsState, pd_target_dof: jax.Array
) -> PhysicsState:
    """Advance one control period (default 1/30 s) under PD position control.

    The reported per-body contact force is averaged over the period's
    substeps (compliant contacts oscillate at the substep rate; the mean is
    the physically meaningful load and feeds fall termination, ≙ contact_buf
    in humanoid.py:1572-1608)."""
    from pulse_tpu.physics.substep_fused import fused_substep

    cfg = model.config
    h = cfg.h
    n = cfg.steps_per_control
    acc = jnp.zeros_like(state.contact_force)
    for _ in range(n):
        # fused_substep benchmarks faster than the scatter-free
        # substep_lp variant on v5e (163k vs 142k steps/s @ 4096 envs);
        # both are golden-tested equal — revisit per TPU generation
        state = fused_substep(model, state, pd_target_dof, h)
        acc = acc + state.contact_force
    state = refresh_kinematics(model, state)
    return state.replace(contact_force=acc / n)


def physics_step_torque(
    model: Model, state: PhysicsState, tau_dof: jax.Array
) -> PhysicsState:
    """Advance one control period under direct torque actuation.

    ≙ control_mode 'force' (humanoid.py:1249-1254): the policy's action,
    already scaled by motor efforts × power_scale at the env layer, is held
    constant across the period's substeps, exactly like Isaac Gym's
    set_dof_actuation_force_tensor applied once before the simulate loop."""
    cfg = model.config
    h = cfg.h
    acc = jnp.zeros_like(state.contact_force)
    for _ in range(cfg.steps_per_control):
        state = _substep(
            model, state, None, h, tau_dof=tau_dof, passive_kd=model.joint_kd
        )
        acc = acc + state.contact_force
    state = refresh_kinematics(model, state)
    return state.replace(contact_force=acc / cfg.steps_per_control)


def physics_step_pd_explicit(
    model: Model, state: PhysicsState, pd_target_dof: jax.Array
) -> PhysicsState:
    """Advance one control period under *explicit* (non-stable) PD control.

    ≙ control_mode 'pd' (humanoid.py:1260-1297): every inner sim step
    recomputes tau = kp·(target − dof) − kd·dof_vel from the held target and
    applies it as an actuation force. The reference quarters the MJCF gains
    for this mode (humanoid.py:1000-1001) and clamps |tau| ≤ 1000
    (humanoid.py:899) — explicit PD at the full stable-PD gains would be
    unstable at the 120 Hz substep rate."""
    cfg = model.config
    h = cfg.h
    Jm1 = model.num_joints
    target = pd_target_dof.reshape(Jm1, 3)
    kp = model.joint_kp[:, None] / 4.0
    kd = model.joint_kd[:, None] / 4.0
    acc = jnp.zeros_like(state.contact_force)
    for _ in range(cfg.steps_per_control):
        dof = q.quat_to_exp_map(state.joint_rot)
        tau = kp * (target - dof) - kd * state.joint_omega
        tau = jnp.clip(tau, -1000.0, 1000.0)
        state = _substep(model, state, None, h, tau_dof=tau)
        acc = acc + state.contact_force
    state = refresh_kinematics(model, state)
    return state.replace(contact_force=acc / cfg.steps_per_control)


def physics_step_with_prop(model: Model, prop_spec, state: PhysicsState, prop, pd_target_dof):
    """Coupled humanoid + free-prop control step (strike task).

    Each substep: compute two-way humanoid/prop contact from the refreshed
    kinematics, advance the prop, then the humanoid with the reaction forces."""
    from pulse_tpu.physics.prop import prop_step

    cfg = model.config
    h = cfg.h
    n = cfg.steps_per_control
    acc = jnp.zeros_like(state.contact_force)
    prop_contact_acc = jnp.zeros(3)
    for _ in range(n):
        state = refresh_kinematics(model, state)
        prop, f_ext_h, prop_contact = prop_step(
            model, prop_spec, prop,
            state.body_pos, state.body_rot, state.body_vel, state.body_ang_vel, h,
        )
        state = _substep(model, state, pd_target_dof, h, f_ext_extra=f_ext_h)
        acc = acc + state.contact_force
        prop_contact_acc = prop_contact_acc + prop_contact
    state = refresh_kinematics(model, state)
    return state.replace(contact_force=acc / n), prop, prop_contact_acc / n
