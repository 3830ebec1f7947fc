"""SMPL body model: linear blend skinning in pure jnp.

Re-implements the subset of the external `smpl_sim` dependency the reference
uses (SURVEY.md §0: SMPL_Parser for gendered LBS — motion_lib_smpl.py:46-99
height fix via LBS vertices; SMPL_Robot per-shape skeleton generation —
humanoid.py:693-720):

  - joints/vertices from (betas, pose) via shape blendshapes + LBS
  - shaped rest-pose joint positions -> per-shape SkeletonTree
    (bone offsets for the shape-variation training path)

Model data comes from the standard SMPL release pickles (not shipped here;
point `load_smpl_model` at SMPL_{NEUTRAL,MALE,FEMALE}.pkl). All math is
batched jnp so the height-fix and shape pipelines jit/vmap.
"""

from __future__ import annotations

import dataclasses
import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from pulse_tpu.ops import quat as q
from pulse_tpu.kinematics.skeleton import SkeletonTree


SMPL_JOINT_NAMES = (
    "Pelvis", "L_Hip", "R_Hip", "Torso", "L_Knee", "R_Knee", "Spine",
    "L_Ankle", "R_Ankle", "Chest", "L_Toe", "R_Toe", "Neck", "L_Thorax",
    "R_Thorax", "Head", "L_Shoulder", "R_Shoulder", "L_Elbow", "R_Elbow",
    "L_Wrist", "R_Wrist", "L_Hand", "R_Hand",
)
# (SMPL's Spine1/Spine2/Spine3/Foot/Collar renamed to the MJCF humanoid's
# Torso/Spine/Chest/Toe/Thorax naming, matching the reference's convention)


@dataclasses.dataclass(frozen=True)
class SMPLModel:
    v_template: np.ndarray     # [V, 3]
    shapedirs: np.ndarray      # [V, 3, S]
    J_regressor: np.ndarray    # [J, V]
    weights: np.ndarray        # [V, J]
    parents: np.ndarray        # [J]
    faces: np.ndarray | None = None  # [F, 3] triangles ('f' in the pickle)

    @property
    def num_joints(self) -> int:
        return self.J_regressor.shape[0]


def load_smpl_model(path: str) -> SMPLModel:
    """Load a standard SMPL release pickle (chumpy arrays converted)."""
    with open(path, "rb") as fh:
        data = pickle.load(fh, encoding="latin1")

    def arr(x):
        return np.asarray(x, np.float64) if not hasattr(x, "r") else np.asarray(x.r, np.float64)

    shapedirs = arr(data["shapedirs"])[:, :, :10]
    J_regressor = data["J_regressor"]
    if hasattr(J_regressor, "toarray"):
        J_regressor = J_regressor.toarray()
    return SMPLModel(
        v_template=arr(data["v_template"]),
        shapedirs=np.asarray(shapedirs),
        J_regressor=np.asarray(J_regressor),
        weights=arr(data["weights"]),
        # release pickles store the root's parent as uint32(-1) = 4294967295
        parents=np.where(
            (p := np.asarray(data["kintree_table"][0], np.int64)[:24]) >= 2**31,
            -1,
            p,
        ),
        faces=(
            np.asarray(data["f"], np.int64) if data.get("f") is not None else None
        ),
    )


def shaped_joints(model: SMPLModel, betas: jax.Array) -> jax.Array:
    """Rest-pose joint positions for shape betas [..., S] -> [..., J, 3].

    precision=highest: this is offline shape generation, and the TPU's
    default bf16 matmul precision would quantize bone lengths by ~3 mm."""
    v = jnp.asarray(model.v_template) + jnp.einsum(
        "vds,...s->...vd", jnp.asarray(model.shapedirs), betas,
        precision="highest",
    )
    return jnp.einsum(
        "jv,...vd->...jd", jnp.asarray(model.J_regressor), v,
        precision="highest",
    )


def lbs(
    model: SMPLModel,
    betas: jax.Array,        # [S]
    pose_quat: jax.Array,    # [J, 4] xyzw local joint rotations (SMPL order)
    trans: jax.Array,        # [3]
) -> tuple[jax.Array, jax.Array]:
    """Linear blend skinning -> (vertices [V, 3], joints [J, 3])."""
    v_shaped = jnp.asarray(model.v_template) + jnp.einsum(
        "vds,s->vd", jnp.asarray(model.shapedirs), betas, precision="highest"
    )
    joints = jnp.einsum(
        "jv,vd->jd", jnp.asarray(model.J_regressor), v_shaped,
        precision="highest",
    )

    J = model.num_joints
    parents = model.parents
    # world transforms down the chain
    g_rot = [None] * J
    g_pos = [None] * J
    g_rot[0] = pose_quat[0]
    g_pos[0] = joints[0]
    for i in range(1, J):
        p = int(parents[i])
        g_rot[i] = q.quat_mul_norm(g_rot[p], pose_quat[i])
        g_pos[i] = g_pos[p] + q.quat_rotate(g_rot[p], joints[i] - joints[p])
    g_rot = jnp.stack(g_rot)
    g_pos = jnp.stack(g_pos)

    # skinning: x' = sum_j w_j (R_j (x - j_rest) + j_world)
    w = jnp.asarray(model.weights)  # [V, J]
    rel = v_shaped[:, None, :] - joints[None, :, :]          # [V, J, 3]
    rotated = q.quat_rotate(g_rot[None, :, :], rel) + g_pos[None, :, :]
    verts = jnp.einsum("vj,vjd->vd", w, rotated, precision="highest") + trans
    return verts, g_pos + trans


def ground_height_offset(
    model: SMPLModel, betas: jax.Array, pose_quat: jax.Array, trans: jax.Array
) -> jax.Array:
    """Vertical offset putting the lowest LBS vertex on the ground
    (≙ MotionLibSMPL.fix_trans_height, motion_lib_smpl.py:72-99)."""
    verts, _ = lbs(model, betas, pose_quat, trans)
    return -jnp.min(verts[:, 2])


def skeleton_from_betas(model: SMPLModel, betas: np.ndarray) -> SkeletonTree:
    """Per-shape SkeletonTree (bone offsets from shaped rest joints) —
    the core of SMPL_Robot's per-shape MJCF generation (humanoid.py:693-720)
    without the XML round-trip."""
    joints = np.asarray(shaped_joints(model, jnp.asarray(betas)))
    parents = model.parents.copy()
    parents[0] = -1
    local = joints.copy()
    for i in range(1, len(parents)):
        local[i] = joints[i] - joints[int(parents[i])]
    local[0] = joints[0]
    return SkeletonTree(SMPL_JOINT_NAMES[: len(parents)], parents, local)


@dataclasses.dataclass(frozen=True)
class GenderedSMPL:
    """Gendered model triple (≙ MotionLibSMPL's smpl_parser_{n,m,f},
    motion_lib_smpl.py:46-70): pick the body model per clip gender for the
    LBS ground-height fix. Missing gendered pickles fall back to neutral."""

    neutral: SMPLModel
    male: SMPLModel | None = None
    female: SMPLModel | None = None

    GENDER_NUMBER = {"neutral": 0, "male": 1, "female": 2}

    @classmethod
    def load(cls, data_dir: str) -> "GenderedSMPL":
        """Load SMPL_{NEUTRAL,MALE,FEMALE}.pkl from a directory (the
        reference's data/smpl layout)."""
        def maybe(name):
            p = os.path.join(data_dir, name)
            return load_smpl_model(p) if os.path.exists(p) else None

        neutral = maybe("SMPL_NEUTRAL.pkl")
        if neutral is None:
            raise FileNotFoundError(f"{data_dir}/SMPL_NEUTRAL.pkl")
        return cls(
            neutral=neutral, male=maybe("SMPL_MALE.pkl"), female=maybe("SMPL_FEMALE.pkl")
        )

    def for_gender(self, gender) -> SMPLModel:
        if isinstance(gender, str):
            gender = self.GENDER_NUMBER.get(gender, 0)
        return {0: self.neutral, 1: self.male or self.neutral, 2: self.female or self.neutral}[int(gender)]
