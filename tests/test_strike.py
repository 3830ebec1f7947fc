"""Strike env + prop physics tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env.humanoid_strike import HumanoidStrikeEnv
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.ops import quat as q
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.prop import PropSpec, make_prop_state, prop_step, _box_sdf_push


class TestBoxSDF:
    def test_outside_distance(self):
        half = jnp.asarray([1.0, 1.0, 1.0])
        sdf, n = _box_sdf_push(jnp.asarray([[2.0, 0.0, 0.0]]), half)
        np.testing.assert_allclose(sdf, [1.0], atol=1e-6)
        np.testing.assert_allclose(n, [[1.0, 0, 0]], atol=1e-6)

    def test_inside_distance(self):
        half = jnp.asarray([1.0, 1.0, 1.0])
        sdf, n = _box_sdf_push(jnp.asarray([[0.0, 0.8, 0.0]]), half)
        np.testing.assert_allclose(sdf, [-0.2], atol=1e-5)
        np.testing.assert_allclose(n, [[0.0, 1.0, 0]], atol=1e-6)


class TestProp:
    def test_box_settles_on_ground(self):
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        spec = PropSpec(half_extents=(0.25, 0.25, 0.9))
        prop = make_prop_state([5.0, 5.0, 1.2])  # dropped slightly high
        far = jnp.full((24, 3), 100.0)  # humanoid far away
        rot_id = jnp.tile(jnp.asarray([0.0, 0, 0, 1.0]), (24, 1))
        zeros = jnp.zeros((24, 3))
        h = model.config.h

        @jax.jit
        def advance(prop):
            def body(p, _):
                p, _, _ = prop_step(model, spec, p, far, rot_id, zeros, zeros, h)
                return p, None
            prop, _ = jax.lax.scan(body, prop, None, length=240)
            return prop

        prop = advance(prop)
        # settled upright at corner height hz
        assert abs(float(prop.pos[2]) - 0.9) < 0.05
        up = q.quat_rotate(prop.rot, jnp.asarray([0.0, 0, 1.0]))
        assert float(up[2]) > 0.95
        assert float(jnp.linalg.norm(prop.lin_vel)) < 0.2


class TestStrikeEnv:
    def test_smoke(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.5)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidStrikeEnv(model, motion)
        assert env.obs_dim == 358 + 15
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        assert np.all(np.isfinite(np.asarray(state.obs)))
        step = jax.jit(env.step)
        for _ in range(2):
            state = step(state, jnp.zeros((2, env.action_dim)))
        assert np.all(np.isfinite(np.asarray(state.obs)))
        # upright target: reward should be small (no tip, no approach)
        assert np.all(np.asarray(state.reward) < 0.7)
