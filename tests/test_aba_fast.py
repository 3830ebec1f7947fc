"""Golden test: level-parallel ABA must match the reference implementation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.aba_fast import aba_fast
from pulse_tpu.physics.dynamics import aba, spd_joint_torques
from pulse_tpu.physics.state import default_state, refresh_kinematics


@pytest.fixture(scope="module")
def setup():
    model = build_model(load_smpl_humanoid(), PhysicsConfig())
    rng = np.random.default_rng(11)
    state = default_state(model, height=1.2)
    from pulse_tpu import ops

    state = state.replace(
        joint_rot=ops.exp_map_to_quat(jnp.asarray(rng.normal(size=(23, 3)) * 0.3)),
        joint_omega=jnp.asarray(rng.normal(size=(23, 3)) * 0.8),
        root_vel6=jnp.asarray(rng.normal(size=6) * 0.5),
        root_rot=ops.quat_unit(jnp.asarray(rng.normal(size=4))),
    )
    state = refresh_kinematics(model, state)
    tau = jnp.asarray(rng.normal(size=(23, 3)) * 10.0)
    f_ext = jnp.asarray(rng.normal(size=(24, 6)) * 5.0)
    d_extra = jnp.asarray(np.abs(rng.normal(size=(23, 3))) * 0.5)
    return model, state, tau, f_ext, d_extra


class TestABAFast:
    def test_matches_reference(self, setup):
        model, state, tau, f_ext, d_extra = setup
        h = model.config.h
        a0_ref, qdd_ref = aba(model, state, tau, f_ext, state.body_rot, h, d_extra)
        a0_fast, qdd_fast = aba_fast(model, state, tau, f_ext, state.body_rot, h, d_extra)
        np.testing.assert_allclose(a0_fast, a0_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(qdd_fast, qdd_ref, rtol=1e-4, atol=1e-2)

    def test_matches_reference_no_dextra(self, setup):
        model, state, tau, f_ext, _ = setup
        h = model.config.h
        a0_ref, qdd_ref = aba(model, state, tau, f_ext, state.body_rot, h, None)
        a0_fast, qdd_fast = aba_fast(model, state, tau, f_ext, state.body_rot, h, None)
        np.testing.assert_allclose(a0_fast, a0_ref, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(qdd_fast, qdd_ref, rtol=1e-4, atol=1e-2)


class TestInertiaCongruence:
    def test_blocked_matches_generic(self):
        from pulse_tpu.physics import spatial as sp
        from pulse_tpu import ops

        rng = np.random.default_rng(7)
        L = 16
        q_pc = ops.quat_unit(jnp.asarray(rng.normal(size=(L, 4))))
        r = jnp.asarray(rng.normal(size=(L, 3)))
        X = rng.normal(size=(L, 6, 6))
        I_sym = jnp.asarray(X @ np.swapaxes(X, -1, -2))  # symmetric PSD

        got = sp.inertia_to_parent(q_pc, r, I_sym)
        M = sp.motion_matrix_to_child(q_pc, r)
        want = jnp.swapaxes(M, -1, -2) @ I_sym @ M
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=1e-3)
