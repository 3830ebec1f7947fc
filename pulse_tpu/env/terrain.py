"""Procedural terrain: heightfield generation, queries, and height-map obs.

≙ phc/env/tasks/humanoid_pedestrian_terrain.py:975-1195 (Terrain class:
curriculum grid of slopes / pyramid slopes / stairs / discrete obstacles,
trimesh conversion) and the height-map observation machinery
(init_*_height_points:591-689, get_heights:718-773).

TPU redesign: the heightfield is one [H, W] device array; height queries are
bilinear gathers, so terrain contact and the per-env height-map observation
are pure batched ops inside the jitted step (the reference walks a trimesh
in PhysX instead).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TerrainConfig:
    num_tiles_x: int = 8
    num_tiles_y: int = 8
    tile_size: float = 8.0          # meters
    cell_size: float = 0.25         # meters per heightfield cell
    # curriculum proportions (≙ terrain proportions in the reference cfg)
    p_flat: float = 0.3
    p_slope: float = 0.25
    p_stairs: float = 0.25
    p_obstacles: float = 0.2
    max_slope: float = 0.35         # rise/run
    stair_height: float = 0.15
    stair_run: float = 0.4
    obstacle_height: float = 0.2
    obstacle_size: float = 1.0


def generate_heightfield(cfg: TerrainConfig, seed: int = 0) -> np.ndarray:
    """Host-side terrain synthesis -> [H, W] heights (meters).

    Tile difficulty scales with distance from the origin row (curriculum,
    ≙ humanoid_pedestrian_terrain.py:1114-1195)."""
    rng = np.random.default_rng(seed)
    cells = int(cfg.tile_size / cfg.cell_size)
    H = cfg.num_tiles_x * cells
    W = cfg.num_tiles_y * cells
    field = np.zeros((H, W), np.float32)
    probs = np.asarray([cfg.p_flat, cfg.p_slope, cfg.p_stairs, cfg.p_obstacles])
    probs = probs / probs.sum()

    for tx in range(cfg.num_tiles_x):
        difficulty = (tx + 1) / cfg.num_tiles_x
        for ty in range(cfg.num_tiles_y):
            kind = rng.choice(4, p=probs)
            tile = np.zeros((cells, cells), np.float32)
            if kind == 1:  # pyramid slope
                slope = cfg.max_slope * difficulty * rng.uniform(0.5, 1.0)
                xx = np.minimum(np.arange(cells), np.arange(cells)[::-1])
                yy = np.minimum(np.arange(cells), np.arange(cells)[::-1])
                dist = np.minimum.outer(xx, yy).astype(np.float32)
                tile = dist * cfg.cell_size * slope
                if rng.uniform() < 0.5:
                    tile = tile.max() - tile  # inverted pyramid (pit)
            elif kind == 2:  # stairs
                h = cfg.stair_height * difficulty * rng.uniform(0.5, 1.0)
                run_cells = max(int(cfg.stair_run / cfg.cell_size), 1)
                steps = (np.arange(cells) // run_cells).astype(np.float32)
                if rng.uniform() < 0.5:
                    steps = steps[::-1]
                tile = np.tile((steps * h)[:, None], (1, cells))
            elif kind == 3:  # discrete obstacles
                n_obs = rng.integers(4, 10)
                size_cells = max(int(cfg.obstacle_size / cfg.cell_size), 1)
                for _ in range(n_obs):
                    ox = rng.integers(0, max(cells - size_cells, 1))
                    oy = rng.integers(0, max(cells - size_cells, 1))
                    h = cfg.obstacle_height * difficulty * rng.uniform(0.3, 1.0)
                    sign = 1.0 if rng.uniform() < 0.7 else -1.0
                    tile[ox : ox + size_cells, oy : oy + size_cells] = sign * h
            field[tx * cells : (tx + 1) * cells, ty * cells : (ty + 1) * cells] = tile
    return field


def terrain_height(
    heights: jax.Array, cell_size: float, origin: jax.Array, xy: jax.Array
) -> jax.Array:
    """Bilinear height lookup. xy [..., 2] -> [...]. Outside the field the
    border height extends (walkable apron)."""
    H, W = heights.shape
    u = (xy[..., 0] - origin[0]) / cell_size
    v = (xy[..., 1] - origin[1]) / cell_size
    u = jnp.clip(u, 0.0, H - 1.001)
    v = jnp.clip(v, 0.0, W - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    h00 = heights[u0, v0]
    h10 = heights[u0 + 1, v0]
    h01 = heights[u0, v0 + 1]
    h11 = heights[u0 + 1, v0 + 1]
    return (
        h00 * (1 - fu) * (1 - fv)
        + h10 * fu * (1 - fv)
        + h01 * (1 - fu) * fv
        + h11 * fu * fv
    )


def terrain_normal(
    heights: jax.Array, cell_size: float, origin: jax.Array, xy: jax.Array
) -> jax.Array:
    """Surface normal from central-difference gradients. xy [..., 2] -> [..., 3]."""
    eps = cell_size
    dx = (
        terrain_height(heights, cell_size, origin, xy + jnp.asarray([eps, 0.0]))
        - terrain_height(heights, cell_size, origin, xy - jnp.asarray([eps, 0.0]))
    ) / (2 * eps)
    dy = (
        terrain_height(heights, cell_size, origin, xy + jnp.asarray([0.0, eps]))
        - terrain_height(heights, cell_size, origin, xy - jnp.asarray([0.0, eps]))
    ) / (2 * eps)
    n = jnp.stack([-dx, -dy, jnp.ones_like(dx)], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def height_map_points(num_x: int = 16, num_y: int = 16, spacing: float = 0.25) -> np.ndarray:
    """Local sample grid around the character (≙ init_square_height_points,
    humanoid_pedestrian_terrain.py:591-625). [P, 2], centered."""
    xs = (np.arange(num_x) - (num_x - 1) / 2) * spacing
    ys = (np.arange(num_y) - (num_y - 1) / 2) * spacing
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)
