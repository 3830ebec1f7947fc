"""Self-collision narrowphase tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.physics import PhysicsConfig, build_model, physics_step
from pulse_tpu.physics.self_collision import (
    _pair_table,
    _segment_closest,
    self_collision_forces,
)
from pulse_tpu.physics.state import default_state, dof_pos_from_state, refresh_kinematics


class TestSegmentDistance:
    def test_parallel_segments(self):
        a0 = jnp.asarray([[0.0, 0, 0]])
        a1 = jnp.asarray([[1.0, 0, 0]])
        b0 = jnp.asarray([[0.0, 1, 0]])
        b1 = jnp.asarray([[1.0, 1, 0]])
        pa, pb = _segment_closest(a0, a1, b0, b1)
        d = np.linalg.norm(np.asarray(pa - pb), axis=-1)
        np.testing.assert_allclose(d, [1.0], atol=1e-6)

    def test_crossing_segments(self):
        a0 = jnp.asarray([[-1.0, 0, 0]])
        a1 = jnp.asarray([[1.0, 0, 0]])
        b0 = jnp.asarray([[0.0, -1, 0.5]])
        b1 = jnp.asarray([[0.0, 1, 0.5]])
        pa, pb = _segment_closest(a0, a1, b0, b1)
        d = np.linalg.norm(np.asarray(pa - pb), axis=-1)
        np.testing.assert_allclose(d, [0.5], atol=1e-6)


class TestPairTable:
    def test_excludes_adjacent(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        ia, ib = _pair_table(model.parents)
        pairs = set(zip(ia.tolist(), ib.tolist()))
        parents = model.parents
        for i, j in pairs:
            assert parents[j] != i and parents[i] != j
        assert len(pairs) > 150  # most of the 276 pairs survive


class TestForces:
    def test_no_force_in_tpose(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig(self_collision=True))
        state = default_state(model, height=0.94)
        f = self_collision_forces(
            model, model.cap_p0, model.cap_p1, model.cap_r,
            state.body_pos, state.body_rot, state.body_vel, state.body_ang_vel,
        )
        # a neutral standing pose has at most grazing contacts
        assert float(jnp.abs(f).max()) < 200.0

    def test_stand_with_self_collision(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig(self_collision=True))
        state = default_state(model, height=0.94)
        target = dof_pos_from_state(state)
        step = jax.jit(lambda s: physics_step(model, s, target))
        s = state
        for _ in range(30):
            s = step(s)
        assert np.all(np.isfinite(np.asarray(s.root_pos)))
        assert float(s.root_pos[2]) > 0.7
