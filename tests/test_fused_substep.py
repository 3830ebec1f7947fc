"""Golden test: fused substep == naive substep (refresh + contact + ABA)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pulse_tpu import ops
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.state import default_state, refresh_kinematics
from pulse_tpu.physics.step import _substep
from pulse_tpu.physics.substep_fused import fused_substep
from pulse_tpu.physics.substep_lp import lp_substep


class TestLpSubstep:
    def test_matches_fused(self):
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        rng = np.random.default_rng(31)
        state = default_state(model, height=0.9)
        state = state.replace(
            joint_rot=ops.exp_map_to_quat(jnp.asarray(rng.normal(size=(23, 3)) * 0.3)),
            joint_omega=jnp.asarray(rng.normal(size=(23, 3)) * 0.5),
            root_vel6=jnp.asarray(rng.normal(size=6) * 0.4),
        )
        state = refresh_kinematics(model, state)
        target = jnp.asarray(rng.normal(size=69) * 0.3)
        h = model.config.h
        s_a, s_b = state, state
        for _ in range(4):
            s_a = fused_substep(model, s_a, target, h)
            s_b = lp_substep(model, s_b, target, h)
        np.testing.assert_allclose(s_b.root_pos, s_a.root_pos, atol=1e-5)
        np.testing.assert_allclose(s_b.root_vel6, s_a.root_vel6, atol=1e-3)
        np.testing.assert_allclose(s_b.joint_omega, s_a.joint_omega, atol=1e-2)
        np.testing.assert_allclose(s_b.contact_force, s_a.contact_force, atol=1e-2)

    def test_matches_fused_with_fext(self):
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        rng = np.random.default_rng(33)
        state = default_state(model, height=0.9)
        state = refresh_kinematics(model, state)
        target = jnp.zeros(69)
        f_ext = jnp.asarray(rng.normal(size=(24, 6)) * 10.0)
        h = model.config.h
        s_a = fused_substep(model, state, target, h, f_ext)
        s_b = lp_substep(model, state, target, h, f_ext)
        np.testing.assert_allclose(s_b.root_vel6, s_a.root_vel6, atol=1e-4)
        np.testing.assert_allclose(s_b.joint_omega, s_a.joint_omega, atol=1e-3)


class TestFusedSubstep:
    def test_matches_naive(self):
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        rng = np.random.default_rng(21)
        state = default_state(model, height=0.9)
        state = state.replace(
            joint_rot=ops.exp_map_to_quat(jnp.asarray(rng.normal(size=(23, 3)) * 0.3)),
            joint_omega=jnp.asarray(rng.normal(size=(23, 3)) * 0.5),
            root_vel6=jnp.asarray(rng.normal(size=6) * 0.4),
        )
        state = refresh_kinematics(model, state)
        target = jnp.asarray(rng.normal(size=69) * 0.3)
        h = model.config.h

        s_naive = state
        s_fused = state
        for _ in range(4):
            s_naive = _substep(model, s_naive, target, h)
            s_fused = fused_substep(model, s_fused, target, h)

        np.testing.assert_allclose(s_fused.root_pos, s_naive.root_pos, atol=1e-5)
        np.testing.assert_allclose(s_fused.root_vel6, s_naive.root_vel6, atol=1e-3)
        np.testing.assert_allclose(s_fused.joint_omega, s_naive.joint_omega, atol=1e-2)
        dot = np.abs(
            np.sum(np.asarray(s_fused.joint_rot) * np.asarray(s_naive.joint_rot), -1)
        )
        np.testing.assert_allclose(dot, 1.0, atol=1e-6)
        np.testing.assert_allclose(
            s_fused.contact_force, s_naive.contact_force, atol=1e-2
        )
