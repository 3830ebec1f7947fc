"""Pedestrian terrain env: trajectory following over procedural terrain.

≙ phc/env/tasks/humanoid_pedestrian_terrain.py:31 (HumanoidPedestrianTerrain):
the traj-following task plus a local height-map observation sampled around
the character in its heading frame (get_heights:718-773), with spawn
positions scattered over the field and root/termination heights measured
relative to the ground under the character.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.env import kernels
from pulse_tpu.env.humanoid_task import HumanoidTrajEnv, TaskConfig, TaskEnvState
from pulse_tpu.env.terrain import (
    GeneratedTerrain,
    TerrainConfig,
    fov_height_points,
    height_map_points,
    square_fov_height_points,
    square_height_points,
    terrain_height,
)
from pulse_tpu.ops import quat as q


class HumanoidPedestrianTerrainEnv(HumanoidTrajEnv):
    """Trajectory following over a heightfield with height-map obs.

    `sensor_mode` selects the height-sample layout (≙ the reference's
    square / square_fov / fov point initializers, pedestrian_terrain.py:
    591-689): "grid" (centered square grid, the round-1 default), "square"
    (sensor_extent x sensor_res), "square_fov" (forward 2x2 m), "fov"
    (exponential fan)."""

    def __init__(
        self,
        model,
        motion,
        config: TaskConfig | None = None,
        terrain_config: TerrainConfig | None = None,
        terrain_seed: int = 0,
        height_map_shape: tuple[int, int] = (16, 16),
        height_map_spacing: float = 0.25,
        sensor_mode: str = "grid",
        mesh_terrain=None,
    ):
        tcfg = terrain_config or TerrainConfig()
        if mesh_terrain is not None:
            # scanned-scene mode (≙ MeshTerrain path, pedestrian_terrain.py:975):
            # use the rasterized heightfield; spawns come from the walkable map
            self.terrain = mesh_terrain
        else:
            # curriculum heightfield + walkable-location table
            # (≙ Terrain + sample_valid_locations, pedestrian_terrain.py:1114-1191)
            self.terrain = GeneratedTerrain.generate(tcfg, seed=terrain_seed)
        heights = np.asarray(self.terrain.heights)
        cell = self.terrain.cell_size
        origin = np.asarray(self.terrain.origin, np.float32)
        extent_x = heights.shape[0] * cell
        extent_y = heights.shape[1] * cell
        model = model.with_terrain(heights, cell, origin)
        super().__init__(model, motion, config)
        self.terrain_cfg = tcfg
        self.mesh_terrain = mesh_terrain
        self._extent = (extent_x, extent_y)
        self.sensor_mode = sensor_mode
        self._terrain_ctor_kwargs = dict(
            terrain_config=tcfg,
            terrain_seed=terrain_seed,
            height_map_shape=height_map_shape,
            height_map_spacing=height_map_spacing,
            sensor_mode=sensor_mode,
            mesh_terrain=mesh_terrain,
        )
        if sensor_mode == "grid":
            pts = height_map_points(*height_map_shape, spacing=height_map_spacing)
            self._hm_grid_shape = height_map_shape
        elif sensor_mode == "square":
            pts = square_height_points()
            n = int(np.sqrt(pts.shape[0]))
            self._hm_grid_shape = (n, n)
        elif sensor_mode == "square_fov":
            pts = square_fov_height_points()
            self._hm_grid_shape = (20, 20)
        elif sensor_mode == "fov":
            pts = fov_height_points()
            self._hm_grid_shape = None  # fan layout: no square grid
        else:
            raise ValueError(f"unknown sensor_mode {sensor_mode!r}")
        self._hm_points = jnp.asarray(pts)
        self.height_map_dim = pts.shape[0]
        self.task_obs_dim = 2 * self.config.traj_num_samples + self.height_map_dim
        self.obs_dim = self.self_obs_dim + self.task_obs_dim
        # index permutation for the mirror-augmented obs (flip across the
        # heading axis): nearest sample point with y negated
        flipped = pts * np.asarray([1.0, -1.0], np.float32)
        d = np.linalg.norm(pts[None, :, :] - flipped[:, None, :], axis=-1)
        self._hm_flip_perm = jnp.asarray(np.argmin(d, axis=1))

    # ------------------------------------------------------------------ #

    def _ctor_kwargs(self) -> dict:
        # with_terrain on the already-augmented model is idempotent, so
        # with_config can safely pass self.model back through __init__
        return dict(self._terrain_ctor_kwargs)

    def _ground_z(self, xy):
        return terrain_height(
            self.model.terrain_heights,
            self.model.terrain_cell,
            self.model.terrain_origin,
            xy,
        )

    def reset_one(self, key, sampling_prob=None):
        state = super().reset_one(key, sampling_prob)
        # spawn on a random WALKABLE cell (≙ sample_valid_locations,
        # pedestrian_terrain.py:1176-1191 — both generated-curriculum and
        # scanned terrains carry a walkable table) and lift onto the ground
        k1, _ = jax.random.split(jax.random.fold_in(state.key, 3))
        ph = state.physics
        new_xy = self.terrain.sample_valid_locations(k1, 1)[0]
        dz = self._ground_z(new_xy)
        root_pos = jnp.concatenate([new_xy, ph.root_pos[2:3] + dz])
        shift = root_pos - ph.root_pos
        ph = ph.replace(
            root_pos=root_pos, body_pos=ph.body_pos + shift[None, :]
        )
        state = state.replace(physics=ph)
        # regenerate the trajectory from the new spawn
        task = self._reset_task(jax.random.fold_in(state.key, 4), ph)
        state = state.replace(task=task)
        return state.replace(obs=self._observe(state))

    # ------------------------------------------------------------------ #

    def _height_map_obs(self, state: TaskEnvState) -> jax.Array:
        """Ground heights on the local grid, root-relative
        (≙ get_heights + obs packing, humanoid_pedestrian_terrain.py:718-773)."""
        ph = state.physics
        heading = q.calc_heading_quat(ph.root_rot)
        pts3 = jnp.concatenate(
            [self._hm_points, jnp.zeros((self._hm_points.shape[0], 1))], axis=-1
        )
        world = q.quat_rotate(heading[None], pts3)[:, 0:2] + ph.root_pos[None, 0:2]
        hz = self._ground_z(world)
        return jnp.clip(ph.root_pos[2] - hz - 0.9, -2.0, 2.0)

    def _task_obs(self, state):
        traj_obs = super()._task_obs(state)
        return jnp.concatenate([traj_obs, self._height_map_obs(state)])

    def flip_task_obs(self, task_obs: jax.Array) -> jax.Array:
        """Mirror the task obs across the heading axis — the observation-side
        companion of motion/mirror.py for symmetry-augmented training
        (≙ _compute_flip_task_obs, pedestrian_terrain.py:442-477: negate the
        heading-local y of the trajectory samples, flip the height map).
        Works batched or single ([..., task_obs_dim])."""
        n_traj = 2 * self.config.traj_num_samples
        traj = task_obs[..., :n_traj].reshape(*task_obs.shape[:-1], -1, 2)
        traj = traj * jnp.asarray([1.0, -1.0])
        hm = task_obs[..., n_traj:]
        hm = hm[..., self._hm_flip_perm]
        return jnp.concatenate(
            [traj.reshape(*task_obs.shape[:-1], -1), hm], axis=-1
        )

    def _task_reward(self, prev_state, state):
        # xy trajectory reward is unchanged; terrain supplies the challenge
        return super()._task_reward(prev_state, state)

    def _termination_height_ref(self, state):
        return self._ground_z(state.physics.root_pos[0:2])
