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
from pulse_tpu.env.humanoid_task import TaskConfig
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


class TestMeshTerrain:
    """Scanned-scene terrain (≙ MeshTerrain, pedestrian_terrain.py:975-1110)."""

    def test_from_heightmap_walkable_sampling(self):
        from pulse_tpu.env.terrain import MeshTerrain

        hm = np.zeros((20, 20), np.float32)
        hm[10:, :] = 5.0  # a cliff: the jump row is unwalkable
        mt = MeshTerrain.from_heightmap(hm, cell_size=0.5, origin=(0.0, 0.0))
        pts = np.asarray(mt.sample_valid_locations(jax.random.PRNGKey(0), 256))
        assert pts.shape == (256, 2)
        # every sampled point sits on a locally-flat cell
        h = np.asarray(mt.height_at(jnp.asarray(pts)))
        assert np.all((np.abs(h) < 0.3) | (np.abs(h - 5.0) < 0.3))

    def test_explicit_walkable_map(self):
        from pulse_tpu.env.terrain import MeshTerrain

        hm = np.zeros((8, 8), np.float32)
        wm = np.zeros((8, 8), np.uint8)
        wm[2, 3] = 1
        mt = MeshTerrain.from_heightmap(hm, wm, cell_size=1.0, origin=(0.0, 0.0))
        pts = np.asarray(mt.sample_valid_locations(jax.random.PRNGKey(1), 32))
        np.testing.assert_allclose(pts, np.tile([[2.0, 3.0]], (32, 1)))

    def test_mesh_rasterization(self):
        """A sloped quad rasterizes to a plane; heights match analytically."""
        from pulse_tpu.env.terrain import MeshTerrain

        # z = 0.25 * x over [0,4]x[0,4] (gentle slope: stays walkable)
        verts = np.array(
            [[0, 0, 0], [4, 0, 1], [4, 4, 1], [0, 4, 0]], np.float64
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]])
        mt = MeshTerrain.from_mesh(verts, faces, cell_size=0.5)
        xy = jnp.asarray([[1.0, 2.0], [3.0, 1.0], [2.0, 2.0]])
        h = np.asarray(mt.height_at(xy))
        np.testing.assert_allclose(h, [0.25, 0.75, 0.5], atol=0.1)

    def test_terrain_env_with_mesh(self):
        """Env accepts a scanned terrain and spawns on walkable cells."""
        from pulse_tpu.env.terrain import MeshTerrain

        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        hm = np.zeros((40, 40), np.float32)
        mt = MeshTerrain.from_heightmap(hm, cell_size=0.5, origin=(-10.0, -10.0))
        env = HumanoidPedestrianTerrainEnv(
            model, motion, mesh_terrain=mt, height_map_shape=(4, 4)
        )
        keys = jax.random.split(jax.random.PRNGKey(2), 2)
        state = jax.jit(env.reset)(keys)
        assert np.all(np.isfinite(np.asarray(state.obs)))
        xy = np.asarray(state.physics.root_pos[:, :2])
        assert (xy >= -10.0).all() and (xy <= 10.0).all()


class TestTerrainDepth:
    """Round-1 VERDICT missing #6: sensor layouts, walkable curriculum,
    flip-augmented obs."""

    def test_sensor_layouts(self):
        from pulse_tpu.env.terrain import (
            center_height_points,
            fov_height_points,
            root_points,
            square_fov_height_points,
            square_height_points,
        )

        assert center_height_points().shape == (9, 2)
        assert square_height_points(extent=2.0, res=32).shape == (32 * 32, 2)
        sq = square_fov_height_points()
        assert sq.shape == (400, 2)
        assert sq[:, 0].min() == pytest.approx(-0.02)
        assert sq[:, 0].max() == pytest.approx(1.98)
        fov = fov_height_points()
        # 18 radii x 25 angles, forward-facing fan within 110 degrees
        assert fov.shape == (450, 2)
        ang = np.abs(np.degrees(np.arctan2(fov[:, 1], fov[:, 0])))
        assert ang.max() <= 110.0 + 1e-4
        r = np.linalg.norm(fov, axis=-1)
        assert r.max() == pytest.approx(2.0, abs=1e-5)
        assert root_points().shape == (200, 2)

    def test_walkable_curriculum(self):
        from pulse_tpu.env.terrain import GeneratedTerrain, TerrainConfig

        terr = GeneratedTerrain.generate(
            TerrainConfig(num_tiles_x=4, num_tiles_y=4), seed=0
        )
        assert terr.walkable_xy.shape[0] > 100
        key = jax.random.PRNGKey(0)
        locs = terr.sample_valid_locations(key, 16)
        assert locs.shape == (16, 2)
        # every sampled spawn lies on a low-slope cell
        from pulse_tpu.env.terrain import terrain_height

        eps = terr.cell_size
        for d in (jnp.asarray([eps, 0.0]), jnp.asarray([0.0, eps])):
            slope = jnp.abs(
                terr.height_at(locs + d) - terr.height_at(locs - d)
            ) / (2 * eps)
            assert float(slope.max()) < 0.8

    @pytest.mark.parametrize("mode,dim", [("square_fov", 400), ("fov", 450)])
    def test_sensor_modes_env(self, mode, dim):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidPedestrianTerrainEnv(
            model, motion, TaskConfig(episode_length=20), sensor_mode=mode
        )
        assert env.height_map_dim == dim
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = env.reset(keys)
        assert state.obs.shape == (2, env.obs_dim)
        assert bool(jnp.all(jnp.isfinite(state.obs)))

    def test_flip_task_obs(self):
        spec = load_smpl_humanoid()
        model = build_model(spec, PhysicsConfig())
        clips = make_synthetic_clips(spec.skeleton, num_clips=1, seconds=1.0)
        motion = build_motion_data(spec.skeleton, clips)
        env = HumanoidPedestrianTerrainEnv(
            model, motion, TaskConfig(episode_length=20)
        )
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        state = env.reset(keys)
        task_obs = state.obs[:, env.self_obs_dim :]
        flipped = env.flip_task_obs(task_obs)
        assert flipped.shape == task_obs.shape
        # traj y components negate; double flip is identity
        n_traj = 2 * env.config.traj_num_samples
        np.testing.assert_allclose(
            np.asarray(flipped[:, 1:n_traj:2]),
            -np.asarray(task_obs[:, 1:n_traj:2]),
            atol=1e-6,
        )
        back = env.flip_task_obs(flipped)
        np.testing.assert_allclose(np.asarray(back), np.asarray(task_obs), atol=1e-6)
