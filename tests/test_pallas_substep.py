"""Golden tests: the Pallas mega-kernel physics step must reproduce the XLA
path (vmap(physics_step) over fused_substep) on identical inputs.

Runs the kernel in interpret mode on the CPU test mesh; the real Mosaic
lowering is exercised on TPU by bench/training runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.step import physics_step
from pulse_tpu.physics.substep_pallas import (
    ENVS_PER_BLOCK,
    pallas_physics_step,
    supported,
)


@pytest.fixture(scope="module")
def model():
    return build_model(load_smpl_humanoid(), PhysicsConfig())


def _random_states(model, key, B):
    """Plausible random batched states near standing."""
    from pulse_tpu.physics.state import state_from_kinematics

    ks = jax.random.split(key, 6)
    D = model.num_dof
    root_pos = jnp.asarray([0.0, 0.0, 0.95]) + 0.1 * jax.random.normal(ks[0], (B, 3))
    root_rot = jax.random.normal(ks[1], (B, 4)) * 0.1 + jnp.asarray([0, 0, 0, 1.0])
    dof = 0.3 * jax.random.normal(ks[2], (B, D))
    root_vel = 0.5 * jax.random.normal(ks[3], (B, 3))
    root_ang = 0.5 * jax.random.normal(ks[4], (B, 3))
    dof_vel = 0.5 * jax.random.normal(ks[5], (B, D))
    return jax.vmap(state_from_kinematics, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        model, root_pos, root_rot, dof, root_vel, root_ang, dof_vel
    )


def test_supported_gate(model):
    assert supported(model, ENVS_PER_BLOCK)
    assert not supported(model, ENVS_PER_BLOCK + 1)


def test_matches_xla_step(model):
    B = ENVS_PER_BLOCK
    state = _random_states(model, jax.random.PRNGKey(0), B)
    pd = 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B, model.num_dof))

    ref = jax.jit(jax.vmap(physics_step, in_axes=(None, 0, 0)))(model, state, pd)
    out = pallas_physics_step(model, state, pd, interpret=True)

    np.testing.assert_allclose(
        np.asarray(out.root_pos), np.asarray(ref.root_pos), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.root_rot), np.asarray(ref.root_rot), atol=2e-4
    )
    # quaternions can differ by sign per env; compare via |dot| ~ 1
    dots = np.abs(
        np.sum(np.asarray(out.joint_rot) * np.asarray(ref.joint_rot), axis=-1)
    )
    assert dots.min() > 1 - 1e-5
    np.testing.assert_allclose(
        np.asarray(out.joint_omega), np.asarray(ref.joint_omega), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.root_vel6), np.asarray(ref.root_vel6), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.body_pos), np.asarray(ref.body_pos), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.body_vel), np.asarray(ref.body_vel), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out.body_ang_vel), np.asarray(ref.body_ang_vel), atol=5e-3
    )
    # contact forces: compare where significant (N-scale)
    cf_r = np.asarray(ref.contact_force)
    cf_o = np.asarray(out.contact_force)
    np.testing.assert_allclose(cf_o, cf_r, atol=1.0)


def test_multi_step_stability(model):
    """Several kernel steps keep a standing humanoid near its reference
    (PD holds the pose) — catches integration/order bugs the single-step
    comparison might mask."""
    B = ENVS_PER_BLOCK
    state = _random_states(model, jax.random.PRNGKey(2), B)
    from pulse_tpu.physics.state import dof_pos_from_state

    pd = jax.vmap(dof_pos_from_state)(state)
    s = state
    for _ in range(3):
        s = pallas_physics_step(model, s, pd, interpret=True)
    assert np.all(np.isfinite(np.asarray(s.root_pos)))
    assert np.asarray(s.root_pos[:, 2]).min() > 0.2
