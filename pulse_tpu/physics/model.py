"""Static physics model: device-ready constants derived from a RobotSpec.

Replaces Isaac Gym's create_sim/load_asset/create_actor pipeline
(phc/env/tasks/humanoid.py:517-1035): all per-body/per-joint/per-geom
quantities become explicit arrays in a frozen pytree whose static topology
fields (parents, traversal order) are baked into the XLA trace.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from pulse_tpu.assets.robot_spec import RobotSpec, GeomType
from pulse_tpu.physics import spatial


@dataclasses.dataclass(frozen=True)
class PhysicsConfig:
    """Simulation parameters (≙ sim/default_sim.yaml + env control settings:
    dt 1/60, 2 substeps, control at 30 Hz via control_freq_inv 2)."""

    dt: float = 1.0 / 60.0
    substeps: int = 2
    control_freq_inv: int = 2
    gravity: float = -9.81
    # compliant ground contact
    contact_stiffness: float = 3.0e4
    contact_damping: float = 1.2e3
    friction_regularization: float = 0.08  # m/s scale for smooth Coulomb
    # robustness clamps (≙ Isaac max_depenetration_velocity / max velocities)
    max_contact_force: float = 2000.0      # per contact point, N
    max_angular_velocity: float = 64.0     # rad/s (Isaac default)
    max_linear_velocity: float = 50.0      # m/s
    # joint limit penalty spring
    limit_stiffness: float = 400.0
    limit_damping: float = 10.0
    # capsule-capsule self collision (filtered pairs)
    self_collision: bool = False
    # PD gain scaling (≙ kp_scale/kd_scale cfg, humanoid.py load_smpl_configs)
    kp_scale: float = 1.0
    kd_scale: float = 1.0
    # max dof torque (safety clamp)
    torque_limit: float = 1.0e4

    @property
    def h(self) -> float:
        """Inner integrator step."""
        return self.dt / self.substeps

    @property
    def steps_per_control(self) -> int:
        return self.substeps * self.control_freq_inv

    @property
    def control_dt(self) -> float:
        return self.dt * self.control_freq_inv


@struct.dataclass
class Model:
    """Frozen physics model. Array fields are device constants; `parents`
    and friends are static python metadata (hashable, part of the jit key)."""

    # topology (static)
    parents: tuple = struct.field(pytree_node=False)       # len J, -1 root
    num_bodies: int = struct.field(pytree_node=False)
    config: PhysicsConfig = struct.field(pytree_node=False)
    # bodies grouped by tree depth for level-parallel passes: tuple of
    # (body_ids tuple, parent_ids tuple) per level, root first
    levels: tuple = struct.field(pytree_node=False, default=())
    # static copy of cp_body for trace-time index remapping
    cp_body_static: tuple = struct.field(pytree_node=False, default=())

    # kinematics
    local_translation: jax.Array = None   # [J, 3] joint origin in parent frame

    # inertial
    body_mass: jax.Array = None           # [J]
    body_com: jax.Array = None            # [J, 3]
    spatial_inertia: jax.Array = None     # [J, 6, 6] about body origin
    total_mass: jax.Array = None          # []

    # joints (J-1 ball joints; dof d = 3*(J-1))
    joint_kp: jax.Array = None            # [J-1]
    joint_kd: jax.Array = None            # [J-1]
    joint_armature: jax.Array = None      # [J-1]
    dof_lower: jax.Array = None           # [D]
    dof_upper: jax.Array = None           # [D]

    # PD action mapping (≙ humanoid.py:1037-1111 offsets/scales)
    pd_action_offset: jax.Array = None    # [D]
    pd_action_scale: jax.Array = None     # [D]

    # contact points (ground collision)
    cp_body: jax.Array = None             # [P] int
    cp_offset: jax.Array = None           # [P, 3] body frame
    cp_radius: jax.Array = None           # [P]
    cp_friction: jax.Array = None         # [P]

    # per-body capsule proxies for self-collision
    cap_p0: jax.Array = None              # [J, 3]
    cap_p1: jax.Array = None              # [J, 3]
    cap_r: jax.Array = None               # [J]

    # optional heightfield terrain (None -> flat plane z=0)
    terrain_heights: jax.Array = None     # [H, W] meters
    terrain_cell: float = struct.field(pytree_node=False, default=0.25)
    terrain_origin: jax.Array = None      # [2] world xy of cell (0, 0)

    @property
    def has_terrain(self) -> bool:
        return self.terrain_heights is not None

    def with_terrain(self, heights, cell_size: float, origin) -> "Model":
        import jax.numpy as jnp

        return self.replace(
            terrain_heights=jnp.asarray(heights),
            terrain_cell=float(cell_size),
            terrain_origin=jnp.asarray(origin, jnp.float32),
        )

    @property
    def num_joints(self) -> int:
        return self.num_bodies - 1

    @property
    def num_dof(self) -> int:
        return 3 * self.num_joints


def _contact_points(spec: RobotSpec):
    """Plane-collision proxy points per geom: sphere center, capsule ends,
    box corners. Fully static count -> masked, branch-free narrowphase."""
    bodies, offsets, radii, fric = [], [], [], []
    for g in range(len(spec.geom_body)):
        b = int(spec.geom_body[g])
        t = int(spec.geom_type[g])
        pos = spec.geom_pos[g]
        quat = spec.geom_quat[g]
        size = spec.geom_size[g]
        mu = float(spec.geom_friction[g])

        def rot(v):
            x, y, z, w = quat
            # manual quat rotate (host side, numpy)
            uv = np.cross(quat[:3], v)
            uuv = np.cross(quat[:3], uv)
            return v + 2.0 * (w * uv + uuv)

        if t == GeomType.SPHERE:
            pts = [pos]
            r = [size[0]]
        elif t == GeomType.CAPSULE:
            axis = rot(np.asarray([0.0, 0.0, 1.0]))
            pts = [pos + size[1] * axis, pos - size[1] * axis]
            r = [size[0], size[0]]
        else:  # BOX corners
            pts, r = [], []
            for sx in (-1, 1):
                for sy in (-1, 1):
                    for sz in (-1, 1):
                        corner = np.asarray([sx, sy, sz]) * size
                        pts.append(pos + rot(corner))
                        r.append(0.0)
        for p_, r_ in zip(pts, r):
            bodies.append(b)
            offsets.append(p_)
            radii.append(r_)
            fric.append(mu)
    return (
        np.asarray(bodies, np.int32),
        np.asarray(offsets, np.float32),
        np.asarray(radii, np.float32),
        np.asarray(fric, np.float32),
    )


def build_pd_action_offset_scale(
    dof_lower: np.ndarray, dof_upper: np.ndarray, joint_names: list[str]
) -> tuple[np.ndarray, np.ndarray]:
    """Action -> PD target affine map, reproducing the reference's semantics
    (humanoid.py:1037-1111): per ball joint, a symmetric range of
    1.2*max(|lo|,|hi|) clipped to pi; knees widened to scale 5."""
    D = len(dof_lower)
    lo, hi = dof_lower.copy(), dof_upper.copy()
    for j in range(D // 3):
        s = slice(3 * j, 3 * j + 3)
        m = max(np.abs(lo[s]).max(), np.abs(hi[s]).max())
        scale = min(1.2 * m, np.pi)
        lo[s], hi[s] = -scale, scale
    offset = 0.5 * (hi + lo)
    scale = 0.5 * (hi - lo)
    for j, nm in enumerate(joint_names):
        if nm in ("L_Knee", "R_Knee"):
            scale[3 * j + 1] = 5.0
    return offset.astype(np.float32), scale.astype(np.float32)


def build_model(spec: RobotSpec, config: PhysicsConfig | None = None) -> Model:
    config = config or PhysicsConfig()
    J = spec.num_bodies
    tree = spec.skeleton

    I_spatial = np.zeros((J, 6, 6), np.float32)
    for i in range(J):
        I_spatial[i] = np.asarray(
            spatial.spatial_inertia(
                jnp.asarray(spec.body_mass[i]),
                jnp.asarray(spec.body_com[i]),
                jnp.asarray(spec.body_inertia[i]),
            )
        )

    cp_body, cp_offset, cp_radius, cp_fric = _contact_points(spec)
    from pulse_tpu.physics.self_collision import capsule_proxies

    cap_p0, cap_p1, cap_r = capsule_proxies(spec)
    joint_names = list(tree.node_names[1:])
    pd_offset, pd_scale = build_pd_action_offset_scale(
        spec.dof_lower, spec.dof_upper, joint_names
    )

    level_groups = tuple(
        (
            tuple(int(b) for b in lvl),
            tuple(int(tree.parent_indices[b]) for b in lvl),
        )
        for lvl in tree.levels
    )

    return Model(
        parents=tuple(int(p) for p in tree.parent_indices),
        num_bodies=J,
        config=config,
        levels=level_groups,
        cp_body_static=tuple(int(b) for b in cp_body),
        local_translation=jnp.asarray(tree.local_translation),
        body_mass=jnp.asarray(spec.body_mass),
        body_com=jnp.asarray(spec.body_com),
        spatial_inertia=jnp.asarray(I_spatial),
        total_mass=jnp.asarray(spec.body_mass.sum()),
        joint_kp=jnp.asarray(spec.joint_stiffness * config.kp_scale),
        joint_kd=jnp.asarray(spec.joint_damping * config.kd_scale),
        joint_armature=jnp.asarray(spec.joint_armature),
        dof_lower=jnp.asarray(spec.dof_lower),
        dof_upper=jnp.asarray(spec.dof_upper),
        pd_action_offset=jnp.asarray(pd_offset),
        pd_action_scale=jnp.asarray(pd_scale),
        cp_body=jnp.asarray(cp_body),
        cp_offset=jnp.asarray(cp_offset),
        cp_radius=jnp.asarray(cp_radius),
        cp_friction=jnp.asarray(cp_fric),
        cap_p0=jnp.asarray(cap_p0),
        cap_p1=jnp.asarray(cap_p1),
        cap_r=jnp.asarray(cap_r),
    )
