"""The reference's converted-AMASS pickle format, both directions.

≙ scripts/data_process/convert_amass_isaac.py:26-143 (`run`): SMPL-order
axis-angle poses -> per-joint xyzw quats, joint reorder to the MJCF
humanoid's depth-first order, upright-start base-rotation removal applied
to the GLOBAL rotations (global' = global * inv([.5,.5,.5,.5])), local
rotations recovered through the skeleton, root translation offset by the
skeleton's root offset. Output entries carry keys
pose_quat_global / pose_quat / trans_orig / root_trans_offset / beta /
gender / pose_aa / fps and the file is a joblib dump.

This module produces and consumes that exact schema so reference-converted
AMASS datasets and ours interchange freely.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from pulse_tpu.kinematics.skeleton import SkeletonTree, forward_kinematics, global_to_local
from pulse_tpu.ops import quat as q
from pulse_tpu.smpl.body_model import SMPL_JOINT_NAMES

# the reference's target joint order (convert_amass_isaac.py:48) — identical
# to our MJCF humanoid's depth-first order
MUJOCO_JOINT_NAMES = (
    "Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe", "R_Hip", "R_Knee",
    "R_Ankle", "R_Toe", "Torso", "Spine", "Chest", "Neck", "Head",
    "L_Thorax", "L_Shoulder", "L_Elbow", "L_Wrist", "L_Hand", "R_Thorax",
    "R_Shoulder", "R_Elbow", "R_Wrist", "R_Hand",
)

UPRIGHT_BASE_ROT = np.asarray([0.5, 0.5, 0.5, 0.5], np.float32)


def smpl_to_mujoco_index() -> list[int]:
    """≙ smpl_2_mujoco (convert_amass_isaac.py:85)."""
    return [SMPL_JOINT_NAMES.index(n) for n in MUJOCO_JOINT_NAMES]


def axis_angle_to_quat(aa: np.ndarray) -> np.ndarray:
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    safe = np.where(angle > 1e-8, angle, 1.0)
    half = 0.5 * angle
    xyzw = np.concatenate([aa / safe * np.sin(half), np.cos(half)], axis=-1)
    return np.where(angle > 1e-8, xyzw, np.asarray([0, 0, 0, 1.0]))


def convert_amass_entry(
    pose_aa: np.ndarray,     # [B, 72] SMPL-order axis-angle (hands zeroed)
    trans: np.ndarray,       # [B, 3]
    tree: SkeletonTree,
    fps: float = 30.0,
    beta: np.ndarray | None = None,
    gender: str = "neutral",
    upright_start: bool = True,
) -> dict:
    """One clip -> a reference-schema entry (convert_amass_isaac.py:93-140)."""
    B = pose_aa.shape[0]
    pose_aa = np.concatenate(
        [pose_aa[:, :66], np.zeros((B, 6), pose_aa.dtype)], axis=1
    )
    aa_mj = pose_aa.reshape(B, 24, 3)[:, smpl_to_mujoco_index()]
    pose_quat = axis_angle_to_quat(aa_mj).astype(np.float32)

    root_trans_offset = np.asarray(trans, np.float32) + np.asarray(
        tree.local_translation[0], np.float32
    )

    g_rot, _ = forward_kinematics(
        tree, jnp.asarray(pose_quat), jnp.asarray(root_trans_offset)
    )
    if upright_start:
        # remove the y-up base rotation on the global frame
        # (convert_amass_isaac.py:113: global * inv(base))
        base_inv = q.quat_conjugate(jnp.asarray(UPRIGHT_BASE_ROT))
        g_rot = q.quat_mul(g_rot, jnp.broadcast_to(base_inv, g_rot.shape))
        pose_quat_global = np.asarray(g_rot, np.float32)
        pose_quat = np.asarray(global_to_local(tree, g_rot), np.float32)
    else:
        pose_quat_global = np.asarray(g_rot, np.float32)

    return {
        "pose_quat_global": pose_quat_global,
        "pose_quat": pose_quat,
        "trans_orig": np.asarray(trans, np.float32),
        "root_trans_offset": root_trans_offset,
        "beta": np.zeros(10, np.float32) if beta is None else np.asarray(beta, np.float32),
        "gender": gender,
        "pose_aa": pose_aa,
        "fps": float(fps),
    }


def save_reference_pkl(path: str, entries: dict) -> str:
    import joblib

    joblib.dump(entries, path)
    return path


def load_reference_pkl(path: str) -> dict:
    """joblib first (how the reference writes them), plain pickle fallback."""
    try:
        import joblib

        return joblib.load(path)
    except Exception:
        import pickle

        with open(path, "rb") as fh:
            return pickle.load(fh)
