"""Skeleton trees and forward kinematics, TPU-first.

Re-designs poselib's SkeletonTree/SkeletonState/SkeletonMotion
(/root/reference/poselib/poselib/skeleton/skeleton3d.py:21,253,910) as a
static host-side topology description plus pure-functional batched kernels.

Instead of poselib's per-joint sequential python loop
(skeleton3d.py:389-409), FK here walks the tree **by depth level**: all
joints at the same depth compose against their (already computed) parent
transforms in one vectorized gather+quat_mul. For the 24-body SMPL humanoid
this is 7 fused steps instead of 24, and every step is a [..., J_level, 4]
batched op that XLA maps straight onto the VPU. Topology (parents, levels)
is plain numpy baked into the trace as constants — no dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q


@dataclasses.dataclass(frozen=True)
class SkeletonTree:
    """Static humanoid topology. All fields are host-side numpy constants.

    node_names:        length-J tuple of body names (root first)
    parent_indices:    [J] int; -1 for the root
    local_translation: [J, 3] float; joint origin offset from parent frame
    """

    node_names: tuple[str, ...]
    parent_indices: np.ndarray
    local_translation: np.ndarray

    def __post_init__(self):
        object.__setattr__(self, "parent_indices", np.asarray(self.parent_indices, np.int32))
        object.__setattr__(self, "local_translation", np.asarray(self.local_translation, np.float32))

    @property
    def num_joints(self) -> int:
        return len(self.node_names)

    def index(self, name: str) -> int:
        return self.node_names.index(name)

    def indices_of(self, names: Sequence[str]) -> np.ndarray:
        return np.asarray([self.index(n) for n in names], np.int32)

    @property
    def depths(self) -> np.ndarray:
        d = np.zeros(self.num_joints, np.int32)
        for i, p in enumerate(self.parent_indices):
            if p >= 0:
                d[i] = d[p] + 1
        return d

    @property
    def levels(self) -> list[np.ndarray]:
        """Joint indices grouped by tree depth (level 0 = root)."""
        d = self.depths
        return [np.where(d == lvl)[0].astype(np.int32) for lvl in range(int(d.max()) + 1)]

    def to_dict(self) -> dict:
        return {
            "node_names": list(self.node_names),
            "parent_indices": self.parent_indices.tolist(),
            "local_translation": self.local_translation.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SkeletonTree":
        return cls(
            node_names=tuple(d["node_names"]),
            parent_indices=np.asarray(d["parent_indices"], np.int32),
            local_translation=np.asarray(d["local_translation"], np.float32),
        )


def forward_kinematics(
    tree: SkeletonTree,
    local_rotation: jax.Array,
    root_translation: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Local joint rotations -> global body rotations and positions.

    local_rotation:   [..., J, 4] xyzw (root entry = global root rotation)
    root_translation: [..., 3]
    returns (global_rotation [..., J, 4], global_translation [..., J, 3])

    Semantics match poselib's global_transformation chain
    (skeleton3d.py:389-409): child_global = parent_global * (local_T * local_R).
    """
    J = tree.num_joints
    batch = local_rotation.shape[:-2]
    local_t = jnp.broadcast_to(jnp.asarray(tree.local_translation), batch + (J, 3))

    g_rot = [None] * J
    g_pos = [None] * J
    levels = tree.levels
    root_ids = levels[0]
    assert len(root_ids) == 1, "expected a single root"
    r = int(root_ids[0])
    g_rot[r] = local_rotation[..., r, :]
    g_pos[r] = root_translation

    parents = tree.parent_indices
    for lvl_ids in levels[1:]:
        pids = parents[lvl_ids]
        p_rot = jnp.stack([g_rot[int(p)] for p in pids], axis=-2)   # [..., L, 4]
        p_pos = jnp.stack([g_pos[int(p)] for p in pids], axis=-2)   # [..., L, 3]
        l_rot = local_rotation[..., lvl_ids, :]
        l_t = local_t[..., lvl_ids, :]
        new_rot = q.quat_mul_norm(p_rot, l_rot)
        new_pos = q.quat_rotate(p_rot, l_t) + p_pos
        for k, j in enumerate(lvl_ids):
            g_rot[int(j)] = new_rot[..., k, :]
            g_pos[int(j)] = new_pos[..., k, :]

    return jnp.stack(g_rot, axis=-2), jnp.stack(g_pos, axis=-2)


def global_to_local(tree: SkeletonTree, global_rotation: jax.Array) -> jax.Array:
    """Inverse of FK on rotations (skeleton3d.py:443-463 semantics).

    Root local rotation = root global rotation; child local = parent^-1 * child.
    """
    parents = jnp.asarray(np.maximum(tree.parent_indices, 0))
    parent_rot = jnp.take(global_rotation, parents, axis=-2)
    local = q.quat_mul_norm(q.quat_inverse(parent_rot), global_rotation)
    is_root = jnp.asarray(tree.parent_indices < 0)[..., None]
    return jnp.where(is_root, global_rotation, local)


# --------------------------------------------------------------------------- #
# motion velocities (≙ SkeletonMotion._compute_velocity / _compute_angular_velocity,
# skeleton3d.py:1100-1118): central finite difference + gaussian smoothing
# --------------------------------------------------------------------------- #

def _gaussian_kernel1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2.0
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _smooth_time_axis(x: jax.Array, sigma: float = 2.0) -> jax.Array:
    """Gaussian filter along axis 0 (time) with edge replication.

    Matches scipy.ndimage.gaussian_filter1d(sigma=2, mode="nearest") as used
    by poselib (skeleton3d.py:1103,1117): kernel radius = int(4*sigma + 0.5).
    """
    kernel_size = 2 * int(4.0 * sigma + 0.5) + 1
    k = jnp.asarray(_gaussian_kernel1d(kernel_size, sigma))
    pad = kernel_size // 2
    xp = jnp.concatenate([jnp.repeat(x[:1], pad, 0), x, jnp.repeat(x[-1:], pad, 0)], axis=0)
    # conv along time: sum_k k[i] * xp[t+i]
    out = sum(k[i] * xp[i : i + x.shape[0]] for i in range(kernel_size))
    return out


def compute_linear_velocity(pos: jax.Array, fps: float, smooth: bool = True) -> jax.Array:
    """[T, ..., 3] positions -> [T, ..., 3] velocities (central difference)."""
    v = jnp.gradient(pos, axis=0) * fps
    return _smooth_time_axis(v) if smooth else v


def compute_angular_velocity(rot: jax.Array, fps: float, smooth: bool = True) -> jax.Array:
    """[T, ..., 4] global rotations -> [T, ..., 3] world-frame angular velocity.

    omega(t) = axis*angle of q(t+1)*q(t)^-1 scaled by fps (forward diff;
    the last frame is zero) — poselib's exact estimator
    (skeleton3d.py:1110-1118), golden-tested in test_reference_parity.py.
    """
    diff = q.quat_mul_norm(rot[1:], q.quat_inverse(rot[:-1]))
    angle, axis = q.quat_to_angle_axis(diff)
    omega = axis * (angle[..., None] * fps)
    omega = jnp.concatenate([omega, jnp.zeros_like(omega[-1:])], axis=0)
    return _smooth_time_axis(omega) if smooth else omega
