"""Per-env body-shape variation.

≙ the reference's shape-variation training path (has_shape_variation:
per-env SMPL_Robot MJCF generation, humanoid.py:783-803 + periodic
resampling, amp_agent.py:557-579). TPU redesign: instead of per-env XML and
actors, the physics Model's array leaves gain a leading env axis and the env
vmaps over them — static topology stays shared, so the program is identical
and XLA still sees homogeneous shapes.

Two sources of variation:
  - `vary_model_scales`: isotropic per-env scale factors (height-like), with
    physically consistent mass (~s^3) / inertia (~s^5) scaling
  - `models_from_betas`: SMPL beta-driven bone offsets via
    pulse_tpu.smpl.skeleton_from_betas (needs the SMPL pickle)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.physics.model import Model


def vary_model_scales(
    model: Model, key: jax.Array, num_envs: int,
    scale_range: tuple[float, float] = (0.9, 1.1),
) -> Model:
    """Batched Model with per-env isotropic scale factors."""
    s = jax.random.uniform(
        key, (num_envs,), minval=scale_range[0], maxval=scale_range[1]
    )

    def b(x, power=1.0):
        """broadcast base leaf with scale^power applied per env"""
        sp = s ** power
        return x[None] * sp.reshape((num_envs,) + (1,) * x.ndim)

    # spatial inertia about the body origin scales BLOCK-WISE under an
    # isotropic s: A = I_o ~ s^5, B = m c× ~ s^4, C = m I ~ s^3 (same as
    # models_from_betas). A blanket s^5 made the C block inconsistent with
    # body_mass (s^3) — effectively a ±20% gravity-response error across the
    # 0.9-1.1 range, caught by the Pallas batched-model parity check (which
    # reconstructs B/C from mass and com and thus disagreed with the s^5
    # leaves).
    F = jnp.zeros((num_envs, 1, 6, 6))
    F = F.at[:, :, :3, :3].set(s[:, None, None, None] ** 5)
    F = F.at[:, :, :3, 3:].set(s[:, None, None, None] ** 4)
    F = F.at[:, :, 3:, :3].set(s[:, None, None, None] ** 4)
    F = F.at[:, :, 3:, 3:].set(s[:, None, None, None] ** 3)

    return model.replace(
        local_translation=b(model.local_translation),
        body_mass=b(model.body_mass, 3.0),
        body_com=b(model.body_com),
        spatial_inertia=model.spatial_inertia[None] * F,
        total_mass=b(model.total_mass, 3.0),
        joint_kp=b(model.joint_kp, 2.0),       # gains grow with inertia-ish
        joint_kd=b(model.joint_kd, 2.0),
        joint_armature=b(model.joint_armature, 2.0),
        dof_lower=jnp.broadcast_to(model.dof_lower, (num_envs,) + model.dof_lower.shape),
        dof_upper=jnp.broadcast_to(model.dof_upper, (num_envs,) + model.dof_upper.shape),
        pd_action_offset=jnp.broadcast_to(
            model.pd_action_offset, (num_envs,) + model.pd_action_offset.shape
        ),
        pd_action_scale=jnp.broadcast_to(
            model.pd_action_scale, (num_envs,) + model.pd_action_scale.shape
        ),
        cp_body=jnp.broadcast_to(model.cp_body, (num_envs,) + model.cp_body.shape),
        cp_offset=b(model.cp_offset),
        cp_radius=b(model.cp_radius),
        cp_friction=jnp.broadcast_to(
            model.cp_friction, (num_envs,) + model.cp_friction.shape
        ),
        cap_p0=b(model.cap_p0),
        cap_p1=b(model.cap_p1),
        cap_r=b(model.cap_r),
    )


# the reference's limb grouping for the limb-weight obs channel
# (humanoid.py:398-403,415; lengths + masses summed per group)
LIMB_WEIGHT_GROUPS = (
    ("L_Hip", "L_Knee", "L_Ankle", "L_Toe"),
    ("R_Hip", "R_Knee", "R_Ankle", "R_Toe"),
    ("Pelvis", "Torso", "Spine", "Chest", "Neck", "Head"),
    ("L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand"),
    ("R_Thorax", "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand"),
)


def limb_weight_params(
    local_translation: jax.Array,  # [..., J, 3]
    body_mass: jax.Array,          # [..., J]
    node_names,
) -> jax.Array:
    """Limb-weight obs: summed limb lengths then summed masses per group
    (≙ humanoid.py:946-956 humanoid_limb_and_weights). [..., 10]."""
    lengths = jnp.linalg.norm(local_translation, axis=-1)
    parts = []
    for group in LIMB_WEIGHT_GROUPS:
        ids = jnp.asarray([node_names.index(n) for n in group])
        parts.append(jnp.sum(lengths[..., ids], axis=-1))
    for group in LIMB_WEIGHT_GROUPS:
        ids = jnp.asarray([node_names.index(n) for n in group])
        parts.append(jnp.sum(body_mass[..., ids], axis=-1))
    return jnp.stack(parts, axis=-1)


def models_from_betas(
    model: Model,
    smpl_model,
    betas: jax.Array,          # [N, S]
    node_names,
    default_mass: float | None = None,
) -> Model:
    """Batched Model whose per-env skeletons come from SMPL shape betas
    (≙ SMPL_Robot per-shape MJCF generation + per-env actor properties,
    humanoid.py:693-720,918-1035 — without the XML round-trip).

    Bone offsets are the beta-shaped rest joints exactly; masses / inertias /
    geoms scale per body by the bone-length ratio (mass ~ s^3, the spatial-
    inertia blocks by s^5 / s^4 / s^3); PD gains scale by total-mass ratio
    (the reference's pd_scale = humanoid_mass / default_humanoid_mass,
    humanoid.py:989-993). betas == 0 reproduces `model` bit-exactly when the
    SMPL model's zero-shape joints match the model skeleton (the synthetic
    fixture guarantees this; a real SMPL pickle matches to MJCF rounding)."""
    from pulse_tpu.smpl.body_model import SMPL_JOINT_NAMES, shaped_joints

    N = betas.shape[0]
    J = model.num_bodies
    parents = np.asarray(model.parents)

    joints_smpl = shaped_joints(smpl_model, betas)           # [N, Js, 3] smpl order
    perm = jnp.asarray([SMPL_JOINT_NAMES.index(n) for n in node_names])
    joints = joints_smpl[:, perm]                            # [N, J, 3] model order

    parent_pos = jnp.where(
        (parents < 0)[None, :, None], 0.0, joints[:, np.maximum(parents, 0)]
    )
    new_local = joints - parent_pos                          # root keeps its joint pos

    base_local = model.local_translation                     # [J, 3]
    base_len = jnp.linalg.norm(base_local, axis=-1)
    new_len = jnp.linalg.norm(new_local, axis=-1)
    s = jnp.where(base_len > 1e-6, new_len / jnp.maximum(base_len, 1e-6), 1.0)
    # root has no bone: inherit the mean of its children's scales
    child_mask = jnp.asarray(parents == 0)
    s_root = jnp.sum(jnp.where(child_mask[None], s, 0.0), axis=1) / jnp.maximum(
        jnp.sum(child_mask), 1
    )
    s = s.at[:, 0].set(s_root)                               # [N, J]

    body_mass = model.body_mass[None] * s**3
    total_mass = jnp.sum(body_mass, axis=-1)
    base_total = (
        jnp.asarray(default_mass) if default_mass is not None else model.total_mass
    )
    pd_scale = total_mass / base_total                       # [N]

    # spatial inertia about the body origin: blocks scale s^5 / s^4 / s^3
    F = jnp.zeros((N, J, 6, 6))
    F = F.at[:, :, :3, :3].set(s[..., None, None] ** 5)
    F = F.at[:, :, :3, 3:].set(s[..., None, None] ** 4)
    F = F.at[:, :, 3:, :3].set(s[..., None, None] ** 4)
    F = F.at[:, :, 3:, 3:].set(s[..., None, None] ** 3)

    s_cp = s[:, np.asarray(model.cp_body_static)]            # [N, P]
    s_joint = s[:, 1:]                                       # [N, J-1] (joint j = body j+1)

    def bc(x):
        return jnp.broadcast_to(x, (N,) + x.shape)

    return model.replace(
        local_translation=new_local,
        body_mass=body_mass,
        body_com=model.body_com[None] * s[..., None],
        spatial_inertia=model.spatial_inertia[None] * F,
        total_mass=total_mass,
        joint_kp=model.joint_kp[None] * pd_scale[:, None],
        joint_kd=model.joint_kd[None] * pd_scale[:, None],
        joint_armature=model.joint_armature[None] * s_joint**2,
        dof_lower=bc(model.dof_lower),
        dof_upper=bc(model.dof_upper),
        pd_action_offset=bc(model.pd_action_offset),
        pd_action_scale=bc(model.pd_action_scale),
        cp_body=bc(model.cp_body),
        cp_offset=model.cp_offset[None] * s_cp[..., None],
        cp_radius=model.cp_radius[None] * s_cp,
        cp_friction=bc(model.cp_friction),
        cap_p0=model.cap_p0[None] * s[..., None],
        cap_p1=model.cap_p1[None] * s[..., None],
        cap_r=model.cap_r[None] * s,
    )


def scale_obs_params(key: jax.Array, num_envs: int,
                     scale_range=(0.9, 1.1)) -> jax.Array:
    """Per-env shape parameters for has_shape_obs-style conditioning."""
    return jax.random.uniform(
        key, (num_envs, 1), minval=scale_range[0], maxval=scale_range[1]
    )


def randomize_friction(
    model: Model, key: jax.Array, num_envs: int,
    friction_range: tuple[float, float] = (0.7, 1.3),
) -> Model:
    """Domain randomization of ground friction (≙ apply_randomizations,
    base_task.py:518-697 friction path). Composes with vary_model_scales;
    if the model is already batched the friction leaf is overwritten."""
    mult = jax.random.uniform(
        key, (num_envs, 1), minval=friction_range[0], maxval=friction_range[1]
    )
    base = model.cp_friction
    if base.ndim == 1:
        fric = base[None] * mult
    else:
        fric = base * mult
    updates = {"cp_friction": fric}
    if model.cp_body.ndim == 1:
        # batching one leaf requires batching the others the env vmaps over
        return vary_model_scales(
            model, jax.random.PRNGKey(0), num_envs, (1.0, 1.0)
        ).replace(**updates)
    return model.replace(**updates)
