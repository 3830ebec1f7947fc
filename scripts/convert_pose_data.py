"""Single-pose / MDM-output converters into the training pickle format.

≙ scripts/data_process/convert_data_smpl.py (single static SMPL poses ->
motion pickle) and convert_data_mdm.py (MDM text-to-motion euler output ->
motion pickle): normalize each source's pose representation to SMPL-order
axis-angle + y-up->z-up root correction, then reuse the shared
convert_amass_entry stage (pulse_tpu.motion.reference_format).

Usage:
  # dict pickle of {name: {pose_aa [T,72], trans [T,3], beta?}}:
  python scripts/convert_pose_data.py smpl  in.pkl out_isaac.pkl
  # MDM-style dump: {name: {'pose_euler' [T,24,3] deg XYZ, 'root_translation'}}:
  python scripts/convert_pose_data.py mdm   in.pkl out_isaac.pkl
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import joblib
import numpy as np
from scipy.spatial.transform import Rotation as sRot

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion.reference_format import convert_amass_entry, save_reference_pkl


def mdm_to_pose_aa(pose_euler: np.ndarray, trans: np.ndarray):
    """MDM euler output -> SMPL axis-angle + z-up trans
    (≙ convert_data_mdm.py:48-60: intrinsic-XYZ degrees, then the x+90deg
    upright rotation on root and translation, ground shift to 0.92)."""
    B = pose_euler.shape[0]
    pose_aa = (
        sRot.from_euler("XYZ", pose_euler.reshape(-1, 3), degrees=True)
        .as_rotvec()
        .reshape(B, -1)[:, : 24 * 3]
    )
    transform = sRot.from_euler("xyz", [np.pi / 2, 0, 0])
    pose_aa[:, :3] = (transform * sRot.from_rotvec(pose_aa[:, :3])).as_rotvec()
    trans = np.asarray(trans, np.float64).dot(transform.as_matrix().T)
    trans[:, 2] -= trans[0, 2] - 0.92
    return pose_aa, trans


def convert(in_file: str, out_file: str, kind: str, fps: float = 30.0) -> dict:
    tree = load_smpl_humanoid().skeleton
    data = joblib.load(in_file)
    out = {}
    for name, entry in data.items():
        if kind == "mdm":
            pose_aa, trans = mdm_to_pose_aa(
                np.asarray(entry["pose_euler"]), np.asarray(entry["root_translation"])
            )
        else:
            pose_aa = np.asarray(entry["pose_aa"], np.float64)
            trans = np.asarray(entry["trans"], np.float64)
            if pose_aa.ndim == 1:  # single static pose -> 2-frame hold
                pose_aa = np.tile(pose_aa[None], (2, 1))
                trans = np.tile(trans[None], (2, 1))
        beta = entry.get("beta", entry.get("betas", np.zeros(10)))
        beta = np.asarray(beta, np.float64).reshape(-1)[:10]
        out[str(name)] = convert_amass_entry(
            pose_aa[:, : 24 * 3], trans, tree, fps=fps, beta=beta,
            gender=str(entry.get("gender", "neutral")),
        )
        print(f"  {name}: {out[str(name)]['pose_quat'].shape[0]} frames")
    save_reference_pkl(out_file, out)
    print(f"wrote {len(out)} clips -> {out_file}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["smpl", "mdm"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--fps", type=float, default=30.0)
    args = ap.parse_args()
    convert(args.src, args.dst, args.kind, args.fps)


if __name__ == "__main__":
    main()
