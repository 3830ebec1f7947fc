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

    return model.replace(
        local_translation=b(model.local_translation),
        body_mass=b(model.body_mass, 3.0),
        body_com=b(model.body_com),
        spatial_inertia=b(model.spatial_inertia, 5.0),
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
