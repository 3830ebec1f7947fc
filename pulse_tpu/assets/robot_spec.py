"""Robot specification: everything the physics/kinematics layers need, as
plain numpy arrays (host-side constants baked into XLA traces).

The reference gets this data from Isaac Gym's MJCF loader at runtime
(phc/env/tasks/humanoid.py:807-1035); here it is an explicit, serializable
value so model construction is pure and reproducible.

Joint model: every non-root body hangs off its parent by one **ball joint**
whose coordinates are exponential-map triplets. The reference's MJCF
decomposes each ball joint into 3 sequential hinges for PhysX
(x/y/z triplets, smpl_humanoid.xml), but its own observation/action kernels
already treat each triplet as an exp-map (humanoid.py:1436-1446
dof_to_obs_smpl), so the ball-joint model is the semantically faithful — and
TPU-friendlier — formulation.
"""

from __future__ import annotations

import dataclasses
import enum
import json

import numpy as np

from pulse_tpu.kinematics.skeleton import SkeletonTree


class GeomType(enum.IntEnum):
    SPHERE = 0
    CAPSULE = 1
    BOX = 2


@dataclasses.dataclass(frozen=True)
class RobotSpec:
    skeleton: SkeletonTree

    # per ball joint (index j -> body j+1), radians / SI
    joint_stiffness: np.ndarray   # [J-1] PD kp per joint (applied to all 3 dof)
    joint_damping: np.ndarray     # [J-1] PD kd
    joint_armature: np.ndarray    # [J-1]
    dof_lower: np.ndarray         # [3*(J-1)] per-dof limit, rad
    dof_upper: np.ndarray         # [3*(J-1)]

    # collision geoms, flattened
    geom_body: np.ndarray         # [NG] owning body index
    geom_type: np.ndarray         # [NG] GeomType
    geom_pos: np.ndarray          # [NG, 3] body-frame offset
    geom_quat: np.ndarray         # [NG, 4] xyzw body-frame orientation
    geom_size: np.ndarray         # [NG, 3] sphere:(r,-,-) capsule:(r,half_len,-) box half-extents
    geom_density: np.ndarray      # [NG]
    geom_friction: np.ndarray     # [NG] sliding friction

    # mass properties derived from geoms (body frame)
    body_mass: np.ndarray         # [J]
    body_com: np.ndarray          # [J, 3]
    body_inertia: np.ndarray      # [J, 3, 3] about COM

    def __post_init__(self):
        for f in dataclasses.fields(self):
            if f.name == "skeleton":
                continue
            v = np.asarray(getattr(self, f.name))
            if f.name in ("geom_body", "geom_type"):
                v = v.astype(np.int32)
            else:
                v = v.astype(np.float32)
            object.__setattr__(self, f.name, v)

    @property
    def num_bodies(self) -> int:
        return self.skeleton.num_joints

    @property
    def num_joints(self) -> int:
        return self.num_bodies - 1

    @property
    def num_dof(self) -> int:
        return 3 * self.num_joints

    # -- (de)serialization ------------------------------------------------- #

    def save(self, path: str) -> None:
        d = {"skeleton": self.skeleton.to_dict()}
        for f in dataclasses.fields(self):
            if f.name == "skeleton":
                continue
            d[f.name] = np.asarray(getattr(self, f.name)).tolist()
        with open(path, "w") as fh:
            json.dump(d, fh)

    @classmethod
    def load(cls, path: str) -> "RobotSpec":
        with open(path) as fh:
            d = json.load(fh)
        skel = SkeletonTree.from_dict(d.pop("skeleton"))
        return cls(skeleton=skel, **{k: np.asarray(v) for k, v in d.items()})


# --------------------------------------------------------------------------- #
# mass properties from primitive geoms
# --------------------------------------------------------------------------- #

def _sphere_mass_inertia(r: float, density: float):
    m = density * 4.0 / 3.0 * np.pi * r**3
    i = 0.4 * m * r * r
    return m, np.diag([i, i, i])


def _box_mass_inertia(half: np.ndarray, density: float):
    a, b, c = 2 * half  # full extents
    m = density * a * b * c
    return m, np.diag([
        m / 12.0 * (b * b + c * c),
        m / 12.0 * (a * a + c * c),
        m / 12.0 * (a * a + b * b),
    ])


def _capsule_mass_inertia(r: float, half_len: float, density: float):
    """Capsule with symmetry axis z, cylinder length 2*half_len."""
    L = 2.0 * half_len
    m_cyl = density * np.pi * r * r * L
    m_caps = density * 4.0 / 3.0 * np.pi * r**3  # both hemispheres
    m = m_cyl + m_caps
    izz = 0.5 * m_cyl * r * r + 0.4 * m_caps * r * r
    ixx = (
        m_cyl * (L * L / 12.0 + r * r / 4.0)
        + m_caps * (0.4 * r * r + half_len * half_len + 3.0 / 8.0 * L * r)
    )
    return m, np.diag([ixx, ixx, izz])


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def compute_mass_properties(
    num_bodies: int,
    geom_body: np.ndarray,
    geom_type: np.ndarray,
    geom_pos: np.ndarray,
    geom_quat: np.ndarray,
    geom_size: np.ndarray,
    geom_density: np.ndarray,
):
    """Aggregate per-geom primitive inertias into per-body (mass, com, inertia).

    Mirrors what Isaac Gym computes internally from geom densities. Returns
    inertia about the body COM, expressed in the body frame."""
    mass = np.zeros(num_bodies)
    first_moment = np.zeros((num_bodies, 3))
    for g in range(len(geom_body)):
        t, s, d = int(geom_type[g]), geom_size[g], float(geom_density[g])
        if t == GeomType.SPHERE:
            m, _ = _sphere_mass_inertia(s[0], d)
        elif t == GeomType.CAPSULE:
            m, _ = _capsule_mass_inertia(s[0], s[1], d)
        else:
            m, _ = _box_mass_inertia(s, d)
        b = int(geom_body[g])
        mass[b] += m
        first_moment[b] += m * geom_pos[g]

    com = np.where(mass[:, None] > 0, first_moment / np.maximum(mass[:, None], 1e-12), 0.0)

    inertia = np.zeros((num_bodies, 3, 3))
    for g in range(len(geom_body)):
        t, s, d = int(geom_type[g]), geom_size[g], float(geom_density[g])
        if t == GeomType.SPHERE:
            m, I = _sphere_mass_inertia(s[0], d)
        elif t == GeomType.CAPSULE:
            m, I = _capsule_mass_inertia(s[0], s[1], d)
        else:
            m, I = _box_mass_inertia(s, d)
        b = int(geom_body[g])
        R = _quat_to_mat_np(geom_quat[g])
        I_body = R @ I @ R.T
        r = geom_pos[g] - com[b]  # offset of geom COM from body COM
        # parallel axis to the body COM
        I_shift = m * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
        inertia[b] += I_body + I_shift

    return mass, com, inertia
