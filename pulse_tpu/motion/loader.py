"""Motion file loading.

Two formats:
  - native .npz: arrays `local_rotation_<i>` [T, J, 4] (xyzw),
    `root_translation_<i>` [T, 3], `fps_<i>` — produced by
    tools/convert_motions.py
  - reference .pkl: dict of clips with `pose_quat_global`/`pose_quat`/
    `root_trans_offset`/`fps` keys (the output of the reference's
    scripts/data_process/convert_amass_isaac.py:26-143), read directly so
    existing PULSE datasets drop in.
"""

from __future__ import annotations

import pickle

import numpy as np

from pulse_tpu.kinematics.skeleton import SkeletonTree


def load_motion_file(path: str, tree: SkeletonTree) -> list[dict]:
    if path.endswith(".npz"):
        return _load_npz(path)
    if path.endswith(".mtn"):
        from pulse_tpu.motion.archive import read_archive

        return read_archive(path)
    if path.endswith((".pkl", ".pk")):
        return _load_reference_pkl(path, tree)
    raise ValueError(f"unsupported motion file {path!r}")


def _load_npz(path: str) -> list[dict]:
    data = np.load(path)
    clips = []
    i = 0
    while f"local_rotation_{i}" in data:
        clips.append(
            {
                "fps": float(data[f"fps_{i}"]),
                "local_rotation": data[f"local_rotation_{i}"].astype(np.float32),
                "root_translation": data[f"root_translation_{i}"].astype(np.float32),
            }
        )
        i += 1
    if not clips:
        raise ValueError(f"{path}: no clips found")
    return clips


def save_npz(path: str, clips: list[dict]) -> None:
    arrays = {}
    for i, c in enumerate(clips):
        arrays[f"local_rotation_{i}"] = np.asarray(c["local_rotation"], np.float32)
        arrays[f"root_translation_{i}"] = np.asarray(c["root_translation"], np.float32)
        arrays[f"fps_{i}"] = np.asarray(c["fps"], np.float32)
    np.savez_compressed(path, **arrays)


def _load_reference_pkl(path: str, tree: SkeletonTree) -> list[dict]:
    """Read the reference's converted-AMASS pickle format (a JOBLIB dump —
    convert_amass_isaac.py:142 — with plain-pickle fallback).

    Each entry holds local joint quats (`pose_quat`, [T, J, 4] xyzw, in the
    skeleton's joint order) and root translations already offset to the
    skeleton (`root_trans_offset`, stored as a torch tensor by the
    reference; np.asarray handles both)."""
    from pulse_tpu.motion.reference_format import load_reference_pkl

    db = load_reference_pkl(path)
    clips = []
    for key, entry in db.items():
        if not isinstance(entry, dict) or "pose_quat" not in entry:
            continue
        lr = np.asarray(entry["pose_quat"], np.float32)
        rt = np.asarray(entry["root_trans_offset"], np.float32)
        fps = float(entry.get("fps", 30.0))
        if lr.ndim != 3 or lr.shape[1] != tree.num_joints or lr.shape[0] == 0:
            continue
        if lr.shape[0] == 1:
            # static pose: hold for two frames so finite-difference
            # velocities are defined (≙ convert_data_smpl.py's 2-frame hold)
            lr = np.repeat(lr, 2, axis=0)
            rt = np.repeat(rt.reshape(1, 3), 2, axis=0)
        clip = {
            "fps": fps,
            "local_rotation": lr,
            "root_translation": rt,
            "name": str(key),
        }
        # per-clip shape row [gender, betas(10)] (≙ gender_beta in the
        # reference's motion store, motion_lib_smpl.py:121-128; gender
        # code 0=neutral 1=male 2=female per convert_amass_isaac.py)
        if "beta" in entry:
            beta = np.asarray(entry["beta"], np.float32).reshape(-1)[:10]
            beta = np.pad(beta, (0, 10 - beta.shape[0]))
            gender = entry.get("gender", "neutral")
            if isinstance(gender, bytes):
                gender = gender.decode()
            code = {"neutral": 0.0, "male": 1.0, "female": 2.0}.get(
                str(gender), 0.0
            )
            clip["shape_params"] = np.concatenate([[code], beta]).astype(
                np.float32
            )
        clips.append(clip)
    if not clips:
        raise ValueError(f"{path}: no usable clips")
    return clips
