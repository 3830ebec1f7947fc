"""Convert raw AMASS npz sequences into a pulse_tpu motion archive.

≙ the reference's scripts/data_process/convert_amass_isaac.py:26-143
(SMPL-order axis-angle -> per-joint quats, joint reorder to the MJCF
humanoid's depth-first order, y-up -> z-up upright base-rotation handling,
root translation offset) + process_amass_db's 30 fps resampling.

Usage:
  python scripts/convert_amass.py out.mtn seq1.npz [seq2.npz ...] \
      [--smpl path/to/SMPL_NEUTRAL.pkl]   # enables the ground-height fix
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion.archive import write_archive
from pulse_tpu.smpl.body_model import SMPL_JOINT_NAMES

TARGET_FPS = 30.0


def axis_angle_to_quat(aa: np.ndarray) -> np.ndarray:
    """[..., 3] -> [..., 4] xyzw."""
    angle = np.linalg.norm(aa, axis=-1, keepdims=True)
    safe = np.where(angle > 1e-8, angle, 1.0)
    axis = aa / safe
    half = 0.5 * angle
    xyzw = np.concatenate([axis * np.sin(half), np.cos(half)], axis=-1)
    xyzw = np.where(angle > 1e-8, xyzw, np.asarray([0, 0, 0, 1.0]))
    return xyzw


def quat_mul(a, b):
    ax, ay, az, aw = np.moveaxis(a, -1, 0)
    bx, by, bz, bw = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by + ay * bw + az * bx - ax * bz,
            aw * bz + az * bw + ax * by - ay * bx,
            aw * bw - ax * bx - ay * by - az * bz,
        ],
        axis=-1,
    )


def convert_sequence(path: str, target_names: tuple, mesh_offset: float = 0.92):
    data = np.load(path)
    if "poses" not in data or "trans" not in data:
        return None
    fps = float(data.get("mocap_framerate", data.get("mocap_frame_rate", 120.0)))
    poses = np.asarray(data["poses"], np.float64)[:, : 24 * 3]
    trans = np.asarray(data["trans"], np.float64)

    # resample to 30 fps (≙ process_amass_db resampling)
    stride = max(int(round(fps / TARGET_FPS)), 1)
    poses = poses[::stride]
    trans = trans[::stride]
    T = poses.shape[0]
    if T < 10:
        return None

    quats = axis_angle_to_quat(poses.reshape(T, 24, 3))

    # AMASS/SMPL is y-up; rotate the root so the character is z-up upright
    # (≙ convert_amass_isaac's upright-start base-rotation removal)
    r90 = axis_angle_to_quat(np.asarray([np.pi / 2, 0.0, 0.0]))
    quats[:, 0] = quat_mul(np.broadcast_to(r90, (T, 4)), quats[:, 0])
    trans = trans[:, [0, 2, 1]] * np.asarray([1.0, -1.0, 1.0])

    # reorder SMPL joints -> MJCF humanoid depth-first order by name
    order = [SMPL_JOINT_NAMES.index(n) for n in target_names]
    quats = quats[:, order]

    # root height: put the skeleton roughly on the ground (full LBS height
    # fix needs the SMPL pickle; approximate with a fixed pelvis offset)
    trans[:, 2] += mesh_offset - trans[0, 2]

    return {
        "fps": TARGET_FPS,
        "local_rotation": quats.astype(np.float32),
        "root_translation": trans.astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("sequences", nargs="+")
    ap.add_argument("--smpl", default="", help="SMPL pickle for height fix")
    args = ap.parse_args()

    tree = load_smpl_humanoid().skeleton
    clips = []
    for seq in args.sequences:
        clip = convert_sequence(seq, tree.node_names)
        if clip is not None:
            clips.append(clip)
            print(f"{seq}: {clip['local_rotation'].shape[0]} frames")
        else:
            print(f"{seq}: skipped")
    if args.smpl:
        from pulse_tpu.smpl.body_model import load_smpl_model, ground_height_offset
        import jax.numpy as jnp

        model = load_smpl_model(args.smpl)
        inv_order = [tree.node_names.index(n) for n in SMPL_JOINT_NAMES]
        for clip in clips:
            quat0 = clip["local_rotation"][0][inv_order]
            off = float(
                ground_height_offset(
                    model,
                    jnp.zeros(10),
                    jnp.asarray(quat0),
                    jnp.asarray(clip["root_translation"][0]),
                )
            )
            clip["root_translation"][:, 2] += off
    write_archive(args.out, clips)
    print(f"wrote {args.out}: {len(clips)} clips")


if __name__ == "__main__":
    main()
