"""Offline SMPL mesh renderer: reference-format motion pkl -> PNG frames.

≙ the reference's Open3D SMPL renderers (scripts/render_smpl_o3d.py,
scripts/vis/vis_smpl_o3d*.py), which pose the SMPL body model over dumped
states and draw the skinned surface. Headless TPU-container equivalent:
LBS through pulse_tpu.smpl.body_model.lbs (shape blendshapes + skinning)
and a matplotlib Poly3DCollection render — no GL, no Open3D.

Input is the reference's AMASS-isaac motion pickle schema (pose_quat local
xyzw in MuJoCo joint order + root_trans_offset + beta — see
motion/reference_format.py ≙ scripts/data_process/convert_amass_isaac.py),
which is also what scripts/convert_amass.py emits.

Usage:
  python scripts/render_smpl_mesh.py --motion motions.pkl --smpl SMPL_NEUTRAL.pkl \
      [--clip 0] [--out render_out] [--stride 3] [--max-frames 60] [--elev 15] [--azim 45]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from mpl_toolkits.mplot3d.art3d import Poly3DCollection


def render_frames(
    smpl_model,
    pose_quat_mj: np.ndarray,    # [T, J, 4] local xyzw, MuJoCo order
    trans: np.ndarray,           # [T, 3]
    betas: np.ndarray,           # [10]
    out_dir: str,
    stride: int = 1,
    max_frames: int = 120,
    elev: float = 15.0,
    azim: float = 45.0,
) -> list[str]:
    """LBS-pose each selected frame and write PNGs; returns the paths."""
    import jax.numpy as jnp

    from pulse_tpu.motion.reference_format import MUJOCO_JOINT_NAMES
    from pulse_tpu.smpl.body_model import SMPL_JOINT_NAMES, lbs

    # MuJoCo-order local rotations -> SMPL canonical order (lbs' convention)
    perm = [MUJOCO_JOINT_NAMES.index(n) for n in SMPL_JOINT_NAMES]
    os.makedirs(out_dir, exist_ok=True)
    faces = smpl_model.faces
    have_mesh = faces is not None and len(faces) > 0
    frames = range(0, len(pose_quat_mj), stride)
    paths = []
    for n, t in enumerate(frames):
        if n >= max_frames:
            break
        verts, joints = lbs(
            smpl_model,
            jnp.asarray(betas, jnp.float32),
            jnp.asarray(pose_quat_mj[t][perm], jnp.float32),
            jnp.asarray(trans[t], jnp.float32),
        )
        verts = np.asarray(verts)
        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(111, projection="3d")
        if have_mesh:
            polys = Poly3DCollection(
                verts[faces], alpha=0.9, facecolor="#c8a17e", edgecolor="none"
            )
            ax.add_collection3d(polys)
        else:
            ax.scatter(verts[:, 0], verts[:, 1], verts[:, 2], s=2, c="#c8a17e")
        j = np.asarray(joints)
        ax.scatter(j[:, 0], j[:, 1], j[:, 2], s=6, c="k")
        c = trans[t]
        ax.set_xlim(c[0] - 1, c[0] + 1)
        ax.set_ylim(c[1] - 1, c[1] + 1)
        ax.set_zlim(0, 2)
        ax.view_init(elev=elev, azim=azim)
        ax.set_axis_off()
        path = os.path.join(out_dir, f"frame_{n:04d}.png")
        fig.savefig(path, dpi=80, bbox_inches="tight")
        plt.close(fig)
        paths.append(path)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--motion", required=True, help="reference-format motion pkl")
    ap.add_argument("--smpl", required=True, help="SMPL release pickle")
    ap.add_argument("--clip", default="0", help="clip name or index in the pkl")
    ap.add_argument("--out", default="render_out")
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--max-frames", type=int, default=60)
    ap.add_argument("--elev", type=float, default=15.0)
    ap.add_argument("--azim", type=float, default=45.0)
    args = ap.parse_args()

    from pulse_tpu.motion.reference_format import load_reference_pkl
    from pulse_tpu.smpl.body_model import load_smpl_model

    entries = load_reference_pkl(args.motion)
    names = list(entries)
    key = names[int(args.clip)] if args.clip.isdigit() else args.clip
    clip = entries[key]
    model = load_smpl_model(args.smpl)
    paths = render_frames(
        model,
        np.asarray(clip["pose_quat"]),
        np.asarray(clip["root_trans_offset"]),
        np.asarray(clip.get("beta", np.zeros(10))),
        args.out,
        stride=args.stride,
        max_frames=args.max_frames,
        elev=args.elev,
        azim=args.azim,
    )
    print(f"rendered {len(paths)} frames of {key!r} to {args.out}")


if __name__ == "__main__":
    main()
