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


@dataclasses.dataclass(frozen=True)
class MeshTerrain:
    """Scanned-environment terrain (≙ MeshTerrain,
    humanoid_pedestrian_terrain.py:975-1110).

    The reference keeps a precomputed heightmap + walkable-cell map derived
    from a scanned scene mesh and (a) spawns characters at random walkable
    cells, (b) samples heights by integer gather with a min over the
    diagonal neighbor. TPU redesign: same data model — one [H, W] device
    heightfield and a flat [N, 2] walkable-coordinate table — so spawning is
    a categorical gather and height queries reuse the bilinear
    terrain_height kernel inside the jitted step.
    """

    heights: jax.Array            # [H, W] meters
    walkable_xy: jax.Array        # [N, 2] world xy of walkable cells
    cell_size: float
    origin: jax.Array             # [2] world xy of cell (0, 0)

    @classmethod
    def from_heightmap(
        cls,
        heightmap: np.ndarray,
        walkable_map: np.ndarray | None = None,
        cell_size: float = 1.0,
        origin: tuple[float, float] | None = None,
        cam_pos: tuple[float, float] = (0.0, 0.0),
        max_walkable_slope: float = 0.3,
    ) -> "MeshTerrain":
        """Build from scanned heightmap data (≙ the reference's
        heigthmap/walkable_map/cam_pos/x_scale pkl payload). `origin`
        defaults to centering the map on cam_pos, matching the reference's
        x_c/y_c recentering (humanoid_pedestrian_terrain.py:991-1000)."""
        hm = np.asarray(heightmap, np.float32)
        H, W = hm.shape
        if origin is None:
            origin = (
                cam_pos[0] - (H / 2) * cell_size,
                cam_pos[1] - (W / 2) * cell_size,
            )
        if walkable_map is None:
            gx, gy = np.gradient(hm, cell_size)
            walkable_map = (np.hypot(gx, gy) < max_walkable_slope).astype(np.uint8)
        cx, cy = np.where(np.asarray(walkable_map) == 1)
        xy = np.stack(
            [origin[0] + cx * cell_size, origin[1] + cy * cell_size], axis=-1
        ).astype(np.float32)
        if xy.shape[0] == 0:
            raise ValueError("terrain has no walkable cells")
        return cls(
            heights=jnp.asarray(hm),
            walkable_xy=jnp.asarray(xy),
            cell_size=float(cell_size),
            origin=jnp.asarray(origin, jnp.float32),
        )

    @classmethod
    def from_mesh(
        cls,
        vertices: np.ndarray,
        faces: np.ndarray,
        cell_size: float = 0.25,
        max_walkable_slope: float = 0.3,
    ) -> "MeshTerrain":
        """Rasterize a scanned triangle mesh into a heightfield (top-surface
        max over faces). One-time host preprocessing; replaces the
        reference's PhysX trimesh collision with gather-friendly data."""
        hm, origin = rasterize_mesh_heightfield(vertices, faces, cell_size)
        return cls.from_heightmap(
            hm, None, cell_size, origin=tuple(origin),
            max_walkable_slope=max_walkable_slope,
        )

    def sample_valid_locations(self, key: jax.Array, n: int) -> jax.Array:
        """Random walkable spawn points [n, 2]
        (≙ sample_valid_locations, humanoid_pedestrian_terrain.py:1005-1009)."""
        idx = jax.random.randint(key, (n,), 0, self.walkable_xy.shape[0])
        return self.walkable_xy[idx]

    def height_at(self, xy: jax.Array) -> jax.Array:
        return terrain_height(self.heights, self.cell_size, self.origin, xy)


def rasterize_mesh_heightfield(
    vertices: np.ndarray, faces: np.ndarray, cell_size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Top-down rasterization: per-cell max height over all triangles whose
    footprint covers the cell center. Returns ([H, W] heights, origin xy)."""
    v = np.asarray(vertices, np.float64)
    f = np.asarray(faces, np.int64)
    lo = v[:, :2].min(axis=0)
    hi = v[:, :2].max(axis=0)
    H = max(int(np.ceil((hi[0] - lo[0]) / cell_size)) + 1, 2)
    W = max(int(np.ceil((hi[1] - lo[1]) / cell_size)) + 1, 2)
    field = np.full((H, W), v[:, 2].min(), np.float32)
    tri = v[f]  # [F, 3, 3]
    for a, b, c in tri:
        bb_lo = np.floor((np.minimum(np.minimum(a, b), c)[:2] - lo) / cell_size).astype(int)
        bb_hi = np.ceil((np.maximum(np.maximum(a, b), c)[:2] - lo) / cell_size).astype(int)
        bb_lo = np.clip(bb_lo, 0, [H - 1, W - 1])
        bb_hi = np.clip(bb_hi, 0, [H - 1, W - 1])
        xs = lo[0] + np.arange(bb_lo[0], bb_hi[0] + 1) * cell_size
        ys = lo[1] + np.arange(bb_lo[1], bb_hi[1] + 1) * cell_size
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        # barycentric coordinates of cell centers in the triangle's xy shadow
        d = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(d) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (gx - c[0]) + (c[0] - b[0]) * (gy - c[1])) / d
        w1 = ((c[1] - a[1]) * (gx - c[0]) + (a[0] - c[0]) * (gy - c[1])) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -1e-9) & (w1 >= -1e-9) & (w2 >= -1e-9)
        z = w0 * a[2] + w1 * b[2] + w2 * c[2]
        patch = field[bb_lo[0] : bb_hi[0] + 1, bb_lo[1] : bb_hi[1] + 1]
        np.maximum(patch, np.where(inside, z, -np.inf), out=patch)
    return field, lo.astype(np.float32)


def height_map_points(num_x: int = 16, num_y: int = 16, spacing: float = 0.25) -> np.ndarray:
    """Local sample grid around the character (≙ init_square_height_points,
    humanoid_pedestrian_terrain.py:591-625). [P, 2], centered."""
    xs = (np.arange(num_x) - (num_x - 1) / 2) * spacing
    ys = (np.arange(num_y) - (num_y - 1) / 2) * spacing
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def center_height_points() -> np.ndarray:
    """3x3 patch under the root (≙ init_center_height_points,
    humanoid_pedestrian_terrain.py:591-606). [9, 2]."""
    y = np.linspace(-0.2, 0.2, 3)
    x = np.linspace(-0.1, 0.1, 3)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def square_height_points(extent: float = 2.0, res: int = 32) -> np.ndarray:
    """Square sensor grid (≙ init_square_height_points,
    humanoid_pedestrian_terrain.py:608-626: sensor_extent x sensor_res).
    [res*res, 2]."""
    xs = np.linspace(-extent, extent, res)
    ys = np.linspace(-extent, extent, res)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def square_fov_height_points() -> np.ndarray:
    """Forward-facing 2m x 2m square (≙ init_square_fov_height_points,
    humanoid_pedestrian_terrain.py:628-642). [400, 2]."""
    y = np.linspace(-1, 1, 20)
    x = np.linspace(-0.02, 1.98, 20)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def root_points() -> np.ndarray:
    """Dense patch under the torso used for ground-height averaging
    (≙ init_root_points, humanoid_pedestrian_terrain.py:644-661). [200, 2]."""
    y = np.linspace(-0.5, 0.5, 20)
    x = np.linspace(-0.25, 0.25, 10)
    gx, gy = np.meshgrid(x, y, indexing="ij")
    return np.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(np.float32)


def fov_height_points() -> np.ndarray:
    """Fan-shaped forward field-of-view sample layout, exponentially denser
    near the body and the heading axis (≙ init_fov_height_points,
    humanoid_pedestrian_terrain.py:663-689 — the exact radii/angle spacing).
    [450, 2]."""
    rs = np.exp(np.arange(0.2, 2, 0.1)) - 0.9
    rs = rs / rs.max() * 2
    max_angle = 110
    phi = np.exp(np.linspace(0.1, 1.5, 12)) - 1
    phi = phi / phi.max() * max_angle
    phi = np.concatenate([-phi[::-1], [0], phi]) * np.pi / 180
    xs, ys = [], []
    for r in rs:
        xs.append(r * np.cos(phi))
        ys.append(r * np.sin(phi))
    xs, ys = np.concatenate(xs), np.concatenate(ys)
    return np.stack([xs, ys], axis=-1).astype(np.float32)


def walkable_map_from_heightfield(
    heights: np.ndarray, cell_size: float, max_slope: float = 0.35,
    border_cells: int = 4,
) -> np.ndarray:
    """1 = walkable. Steep cells (slope above threshold) and a border apron
    are excluded (≙ Terrain.walkable_field_raw + the border subset filter,
    humanoid_pedestrian_terrain.py:1146-1172)."""
    gx, gy = np.gradient(np.asarray(heights, np.float64), cell_size)
    walkable = (np.hypot(gx, gy) <= max_slope).astype(np.uint8)
    walkable[:border_cells] = 0
    walkable[-border_cells:] = 0
    walkable[:, :border_cells] = 0
    walkable[:, -border_cells:] = 0
    return walkable


@dataclasses.dataclass(frozen=True)
class GeneratedTerrain:
    """Curriculum heightfield + its walkable-location table (the generated-
    terrain analogue of MeshTerrain; ≙ Terrain.sample_valid_locations,
    humanoid_pedestrian_terrain.py:1176-1191)."""

    heights: jax.Array
    walkable_xy: jax.Array
    cell_size: float
    origin: jax.Array

    @classmethod
    def generate(
        cls, cfg: TerrainConfig, seed: int = 0, origin: tuple | None = None
    ) -> "GeneratedTerrain":
        hm = generate_heightfield(cfg, seed)
        if origin is None:
            origin = (
                -hm.shape[0] * cfg.cell_size / 2,
                -hm.shape[1] * cfg.cell_size / 2,
            )
        wm = walkable_map_from_heightfield(hm, cfg.cell_size, cfg.max_slope)
        cx, cy = np.where(wm == 1)
        xy = np.stack(
            [origin[0] + cx * cfg.cell_size, origin[1] + cy * cfg.cell_size],
            axis=-1,
        ).astype(np.float32)
        return cls(
            heights=jnp.asarray(hm),
            walkable_xy=jnp.asarray(xy),
            cell_size=float(cfg.cell_size),
            origin=jnp.asarray(origin, jnp.float32),
        )

    def sample_valid_locations(self, key: jax.Array, n: int) -> jax.Array:
        idx = jax.random.randint(key, (n,), 0, self.walkable_xy.shape[0])
        return self.walkable_xy[idx]

    def height_at(self, xy: jax.Array) -> jax.Array:
        return terrain_height(self.heights, self.cell_size, self.origin, xy)
