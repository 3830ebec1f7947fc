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
    TerrainConfig,
    generate_heightfield,
    height_map_points,
    terrain_height,
)
from pulse_tpu.ops import quat as q


class HumanoidPedestrianTerrainEnv(HumanoidTrajEnv):
    """Trajectory following over a heightfield with height-map obs."""

    def __init__(
        self,
        model,
        motion,
        config: TaskConfig | None = None,
        terrain_config: TerrainConfig | None = None,
        terrain_seed: int = 0,
        height_map_shape: tuple[int, int] = (16, 16),
        height_map_spacing: float = 0.25,
        mesh_terrain=None,
    ):
        tcfg = terrain_config or TerrainConfig()
        if mesh_terrain is not None:
            # scanned-scene mode (≙ MeshTerrain path, pedestrian_terrain.py:975):
            # use the rasterized heightfield; spawns come from the walkable map
            heights = np.asarray(mesh_terrain.heights)
            cell = mesh_terrain.cell_size
            origin = np.asarray(mesh_terrain.origin, np.float32)
        else:
            heights = generate_heightfield(tcfg, seed=terrain_seed)
            cell = tcfg.cell_size
            origin = np.asarray(
                [-heights.shape[0] * cell / 2, -heights.shape[1] * cell / 2],
                np.float32,
            )
        extent_x = heights.shape[0] * cell
        extent_y = heights.shape[1] * cell
        model = model.with_terrain(heights, cell, origin)
        super().__init__(model, motion, config)
        self.terrain_cfg = tcfg
        self.mesh_terrain = mesh_terrain
        self._extent = (extent_x, extent_y)
        self._hm_points = jnp.asarray(
            height_map_points(*height_map_shape, spacing=height_map_spacing)
        )
        self.height_map_dim = height_map_shape[0] * height_map_shape[1]
        self.task_obs_dim = 2 * self.config.traj_num_samples + self.height_map_dim
        self.obs_dim = self.self_obs_dim + self.task_obs_dim

    # ------------------------------------------------------------------ #

    def _ground_z(self, xy):
        return terrain_height(
            self.model.terrain_heights,
            self.model.terrain_cell,
            self.model.terrain_origin,
            xy,
        )

    def reset_one(self, key):
        state = super().reset_one(key)
        # scatter spawn over the field and lift onto the local ground
        k1, k2 = jax.random.split(jax.random.fold_in(state.key, 3))
        ph = state.physics
        if self.mesh_terrain is not None:
            # spawn only on walkable scanned-scene cells
            new_xy = self.mesh_terrain.sample_valid_locations(k1, 1)[0]
        else:
            ex, ey = self._extent
            offset_xy = jnp.stack(
                [
                    jax.random.uniform(k1, (), minval=-0.4 * ex, maxval=0.4 * ex),
                    jax.random.uniform(k2, (), minval=-0.4 * ey, maxval=0.4 * ey),
                ]
            )
            new_xy = ph.root_pos[0:2] + offset_xy
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

    def _task_reward(self, prev_state, state):
        # xy trajectory reward is unchanged; terrain supplies the challenge
        return super()._task_reward(prev_state, state)

    def _termination_height_ref(self, state):
        return self._ground_z(state.physics.root_pos[0:2])
