"""Terrain: heightfield generation, queries, terrain env smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.env.terrain import (
    TerrainConfig,
    generate_heightfield,
    height_map_points,
    terrain_height,
    terrain_normal,
)
from pulse_tpu.env.humanoid_terrain import HumanoidPedestrianTerrainEnv
from pulse_tpu.motion import build_motion_data, make_synthetic_clips
from pulse_tpu.physics import PhysicsConfig, build_model
from pulse_tpu.physics.state import default_state, dof_pos_from_state
from pulse_tpu.physics.step import physics_step


class TestHeightfield:
    def test_generation(self):
        cfg = TerrainConfig(num_tiles_x=2, num_tiles_y=2, tile_size=4.0)
        hf = generate_heightfield(cfg, seed=1)
        assert hf.shape == (32, 32)
        assert np.isfinite(hf).all()
        assert hf.std() > 0  # not all flat

    def test_bilinear_interp(self):
        hf = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
        origin = jnp.asarray([0.0, 0.0])
        # halfway between rows with cell 1.0 -> height 0.5
        h = terrain_height(hf, 1.0, origin, jnp.asarray([[0.5, 0.0], [0.0, 0.5]]))
        np.testing.assert_allclose(h, [0.5, 0.0], atol=1e-6)

    def test_normal_points_up_on_flat(self):
        hf = jnp.zeros((8, 8))
        n = terrain_normal(hf, 0.5, jnp.zeros(2), jnp.asarray([[1.0, 1.0]]))
        np.testing.assert_allclose(n, [[0, 0, 1.0]], atol=1e-6)

    def test_height_points_grid(self):
        pts = height_map_points(4, 4, 0.5)
        assert pts.shape == (16, 2)
        np.testing.assert_allclose(pts.mean(0), [0, 0], atol=1e-6)


class TestTerrainPhysics:
    def test_stand_on_raised_platform(self):
        """Humanoid on a uniformly raised field should settle at z ~ height + h0."""
        model = build_model(load_smpl_humanoid(), PhysicsConfig())
        lift = 0.5
        model = model.with_terrain(np.full((16, 16), lift, np.float32), 0.5, [-4.0, -4.0])
        state = default_state(model, height=0.94 + lift)
        target = dof_pos_from_state(state)
        step = jax.jit(lambda s: physics_step(model, s, target))
        s = state
        for _ in range(45):
            s = step(s)
        assert abs(float(s.root_pos[2]) - (0.93 + lift)) < 0.1


class TestTerrainEnv:
    def test_smoke(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=2, seconds=1.5)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidPedestrianTerrainEnv(
            model, motion,
            terrain_config=TerrainConfig(num_tiles_x=2, num_tiles_y=2, tile_size=4.0),
        )
        assert env.obs_dim == 358 + 20 + 256
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = jax.jit(env.reset)(keys)
        assert np.all(np.isfinite(np.asarray(state.obs)))
        out = jax.jit(env.step)(state, jnp.zeros((2, env.action_dim)))
        assert np.all(np.isfinite(np.asarray(out.obs)))
