"""Physics-core validation: conservation laws, free fall, standing stability.

These play the role of the reference's HACK_CONSISTENCY_TEST-style in-env
checks (humanoid_amp.py:748-783) but as a real automated suite.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu import ops
from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import (
    Model,
    PhysicsConfig,
    build_model,
    physics_step,
    state_from_kinematics,
)
from pulse_tpu.physics.state import default_state, refresh_kinematics, dof_pos_from_state
from pulse_tpu.physics.dynamics import aba
from pulse_tpu.physics import spatial as sp


def make_model(**cfg):
    spec = load_smpl_humanoid()
    return build_model(spec, PhysicsConfig(**cfg))


def total_momentum(model, state):
    """World-frame linear momentum from per-body COM velocities."""
    st = refresh_kinematics(model, state)
    com_w = st.body_pos + ops.quat_rotate(st.body_rot, model.body_com)
    v_com = st.body_vel + jnp.cross(st.body_ang_vel, com_w - st.body_pos)
    return jnp.sum(model.body_mass[:, None] * v_com, axis=0)


def kinetic_energy(model, state):
    from pulse_tpu.physics.dynamics import aba  # reuse pass-1 logic inline
    # recompute body-frame spatial velocities like ABA pass 1
    J = model.num_bodies
    v = [state.root_vel6]
    for i in range(1, J):
        p = model.parents[i]
        q_pc = state.joint_rot[i - 1]
        r = model.local_translation[i]
        vJ = jnp.concatenate([state.joint_omega[i - 1], jnp.zeros(3)])
        v.append(sp.motion_to_child(q_pc, r, v[p]) + vJ)
    ke = 0.0
    for i in range(J):
        ke = ke + 0.5 * jnp.dot(v[i], sp.mul_inertia(model.spatial_inertia[i], v[i]))
    return ke


def potential_energy(model, state):
    st = refresh_kinematics(model, state)
    com_w = st.body_pos + ops.quat_rotate(st.body_rot, model.body_com)
    return -model.config.gravity * jnp.sum(model.body_mass * com_w[:, 2])


class TestFreeFall:
    def test_root_free_fall(self):
        model = make_model()
        # start high: no contact; zero gains so no joint torques
        model = model.replace(joint_kp=jnp.zeros(23), joint_kd=jnp.zeros(23))
        state = default_state(model, height=10.0)
        zeros = jnp.zeros(model.num_dof)
        step = jax.jit(lambda s: physics_step(model, s, zeros))
        n = 15  # 0.5 s
        s = state
        for _ in range(n):
            s = step(s)
        t = n * model.config.control_dt
        dz = float(state.root_pos[2] - s.root_pos[2])
        expect = 0.5 * 9.81 * t * t
        assert abs(dz - expect) / expect < 0.05, (dz, expect)

    def test_momentum_conserved_no_gravity(self):
        model = make_model(gravity=0.0)
        state = default_state(model, height=10.0)
        # random joint velocities, nonzero root velocity
        rng = np.random.default_rng(3)
        state = state.replace(
            joint_omega=jnp.asarray(rng.normal(size=(23, 3)) * 0.5),
            root_vel6=jnp.asarray(rng.normal(size=6) * 0.5),
        )
        state = refresh_kinematics(model, state)
        p0 = total_momentum(model, state)
        zeros = jnp.zeros(model.num_dof)
        # keep PD off so only internal dynamics act
        model0 = model.replace(joint_kp=jnp.zeros(23), joint_kd=jnp.zeros(23))
        step = jax.jit(lambda s: physics_step(model0, s, zeros))
        s = state
        for _ in range(10):
            s = step(s)
        p1 = total_momentum(model0, s)
        # internal joint/limit torques cancel exactly in continuous time;
        # discrete integration leaves a small residual
        np.testing.assert_allclose(p1, p0, rtol=0.05, atol=0.5)

    def test_energy_conserved_passive_swing(self):
        # no gravity, no damping/limits: kinetic energy must be conserved
        model = make_model(gravity=0.0, limit_stiffness=0.0, limit_damping=0.0)
        model = model.replace(
            joint_kp=jnp.zeros(23),
            joint_kd=jnp.zeros(23),
            joint_armature=jnp.zeros(23),
        )
        state = default_state(model, height=10.0)
        rng = np.random.default_rng(5)
        state = state.replace(joint_omega=jnp.asarray(rng.normal(size=(23, 3)) * 0.6))
        state = refresh_kinematics(model, state)
        e0 = float(kinetic_energy(model, state))
        zeros = jnp.zeros(model.num_dof)
        step = jax.jit(lambda s: physics_step(model, s, zeros))
        s = state
        for _ in range(10):  # 1/3 s
            s = step(s)
        e1 = float(kinetic_energy(model, s))
        assert abs(e1 - e0) / e0 < 0.05, (e0, e1)


class TestStanding:
    def test_stand_under_pd(self):
        model = make_model()
        state = default_state(model, height=0.94)
        target = dof_pos_from_state(state)
        step = jax.jit(lambda s: physics_step(model, s, target))
        s = state
        for _ in range(60):  # 2 seconds
            s = step(s)
        assert np.all(np.isfinite(np.asarray(s.root_pos)))
        assert float(s.root_pos[2]) > 0.7, float(s.root_pos[2])
        # roughly upright
        up = ops.quat_rotate(s.root_rot, jnp.asarray([0.0, 0, 1.0]))
        assert float(up[2]) > 0.8

    def test_contact_forces_support_weight(self):
        model = make_model()
        state = default_state(model, height=0.94)
        target = dof_pos_from_state(state)
        step = jax.jit(lambda s: physics_step(model, s, target))
        s = state
        for _ in range(30):
            s = step(s)
        fzs = []
        for _ in range(15):
            s = step(s)
            fzs.append(float(jnp.sum(s.contact_force[:, 2])))
        fz = np.mean(fzs)
        weight = float(model.total_mass) * 9.81
        assert abs(fz - weight) / weight < 0.2, (fz, weight)


class TestBatched:
    def test_vmap_step(self):
        model = make_model()
        B = 4
        state = default_state(model, height=0.94)
        batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state)
        targets = jnp.tile(dof_pos_from_state(state), (B, 1))
        step = jax.jit(jax.vmap(lambda s, a: physics_step(model, s, a)))
        out = step(batch, targets)
        assert out.root_pos.shape == (B, 3)
        assert np.all(np.isfinite(np.asarray(out.root_pos)))
