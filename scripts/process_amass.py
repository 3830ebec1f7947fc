"""AMASS preprocessing: raw npz sweep -> filtered 30 fps database ->
reference-format Isaac pickle.

Ports the reference's two-stage pipeline:
  - scripts/data_process/process_amass_raw.py: walk the AMASS release
    directories, collect every *_poses.npz into one dict keyed
    "<dataset>_<subject>_<sequence>" with poses/trans/betas/gender/framerate
  - scripts/data_process/process_amass_db.py:159-224 (process_qpos_list):
    resample to 30 fps, apply the occlusion annotation filter (clips marked
    "sitting"/"airborne" are truncated at the annotated index, other issues
    dropped, bounds < 10 frames dropped), optional SMPL ground-height fix
  - scripts/data_process/convert_amass_isaac.py:26-143: joint reorder +
    upright conversion into the training pickle schema
    (pulse_tpu.motion.reference_format)

Usage:
  python scripts/process_amass.py raw   <amass_root> <out_raw.pkl>
  python scripts/process_amass.py db    <raw.pkl> <out_db.pkl> \
      [--occlusion occl.pkl] [--smpl SMPL_NEUTRAL.pkl]
  python scripts/process_amass.py isaac <db.pkl> <out_isaac.pkl>
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import joblib
import numpy as np

TARGET_FR = 30


def process_raw(amass_root: str, out_file: str) -> dict:
    """≙ process_amass_raw.py: sweep *_poses.npz into one dict."""
    db = {}
    pattern = os.path.join(amass_root, "**", "*_poses.npz")
    for path in sorted(glob.glob(pattern, recursive=True)):
        rel = os.path.relpath(path, amass_root)
        key = rel.replace(os.sep, "_").replace("_poses.npz", "")
        data = np.load(path, allow_pickle=True)
        if "poses" not in data or "trans" not in data:
            continue
        gender = data.get("gender", "neutral")
        if hasattr(gender, "item"):
            gender = gender.item()
        if isinstance(gender, bytes):
            gender = gender.decode("utf-8")
        db[key] = {
            "poses": np.asarray(data["poses"], np.float64),
            "trans": np.asarray(data["trans"], np.float64),
            "betas": np.asarray(data["betas"], np.float64),
            "gender": str(gender),
            "mocap_framerate": float(
                data.get("mocap_framerate", data.get("mocap_frame_rate", 120.0))
            ),
        }
        print(f"  {key}: {db[key]['poses'].shape[0]} frames")
    joblib.dump(db, out_file)
    print(f"wrote {len(db)} sequences -> {out_file}")
    return db


def process_db(
    raw_file: str,
    out_file: str,
    occlusion_file: str | None = None,
    smpl_pkl: str | None = None,
) -> dict:
    """≙ process_amass_db.py:159-224 process_qpos_list."""
    raw = joblib.load(raw_file)
    occlusion = joblib.load(occlusion_file) if occlusion_file else {}
    smpl = None
    if smpl_pkl:
        import os as _os

        from pulse_tpu.smpl.body_model import GenderedSMPL, load_smpl_model

        if _os.path.isdir(smpl_pkl):
            # directory -> gendered triple (≙ MotionLibSMPL's per-gender
            # parsers, motion_lib_smpl.py:46-70)
            smpl = GenderedSMPL.load(smpl_pkl)
        else:
            smpl = load_smpl_model(smpl_pkl)

    out = {}
    for k, v in raw.items():
        key = "0-" + k
        skip = max(int(float(v["mocap_framerate"]) / TARGET_FR), 1)
        # np.asarray: some upstream dbs store torch tensors (the reference's
        # Tensor.numpy monkey-patch exists for the same reason,
        # motion_lib_base.py:33-44)
        pose = np.asarray(v["poses"], np.float64)[::skip]
        trans = np.asarray(v["trans"], np.float64)[::skip]

        bound = pose.shape[0]
        if key in occlusion:
            issue = occlusion[key].get("issue")
            if issue in ("sitting", "airborne") and "idxes" in occlusion[key]:
                bound = occlusion[key]["idxes"][0]  # annotated at 30 fps
                if bound < 10:
                    print(f"  drop {key}: bound too small ({bound})")
                    continue
            else:
                print(f"  drop {key}: irrecoverable issue {issue!r}")
                continue
        if pose.shape[0] < 10:
            continue

        pose = pose[:bound]
        trans = trans[:bound]
        B = pose.shape[0]
        # SMPL only: body pose + zeroed hands (process_amass_db.py:192)
        pose_aa = np.concatenate([pose[:, :66], np.zeros((B, 6))], axis=1)
        betas = np.asarray(v.get("betas", np.zeros(10)), np.float64).reshape(-1)[:10]
        if betas.shape[0] < 10:
            betas = np.concatenate([betas, np.zeros(10 - betas.shape[0])])

        if smpl is not None:
            # ground-height fix: shift so the first frames' lowest LBS
            # vertex touches z=0 (≙ fix_height_smpl_vanilla)
            import jax.numpy as jnp

            from pulse_tpu.motion.reference_format import axis_angle_to_quat
            from pulse_tpu.smpl.body_model import lbs

            from pulse_tpu.smpl.body_model import GenderedSMPL

            model_g = (
                smpl.for_gender(v["gender"])
                if isinstance(smpl, GenderedSMPL)
                else smpl
            )
            quats = axis_angle_to_quat(pose_aa[:1].reshape(1, 24, 3))[0]
            verts, _ = lbs(
                model_g, jnp.asarray(betas, jnp.float32),
                jnp.asarray(quats, jnp.float32),
                jnp.asarray(trans[0], jnp.float32),
            )
            trans = trans + np.asarray([0, 0, -float(jnp.min(verts[:, 2]))])

        out[key] = {
            "pose_aa": pose_aa,
            "trans": trans,
            "beta": betas,
            "seq_name": key,
            "gender": v["gender"],
        }
    joblib.dump(out, out_file)
    print(f"wrote {len(out)} sequences -> {out_file}")
    return out


def process_isaac(db_file: str, out_file: str) -> dict:
    """≙ convert_amass_isaac.py run(): db dict -> training pickle."""
    from pulse_tpu.assets import load_smpl_humanoid
    from pulse_tpu.motion.reference_format import (
        convert_amass_entry,
        save_reference_pkl,
    )

    tree = load_smpl_humanoid().skeleton
    db = joblib.load(db_file)
    out = {}
    for k, v in db.items():
        out[k] = convert_amass_entry(
            np.asarray(v["pose_aa"]),
            np.asarray(v["trans"]),
            tree,
            fps=30.0,
            beta=np.asarray(v.get("beta", np.zeros(10))),
            gender=str(v.get("gender", "neutral")),
        )
        print(f"  {k}: {out[k]['pose_quat'].shape[0]} frames")
    save_reference_pkl(out_file, out)
    print(f"wrote {len(out)} clips -> {out_file}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stage", choices=["raw", "db", "isaac"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--occlusion", default=None)
    ap.add_argument("--smpl", default=None)
    args = ap.parse_args()
    if args.stage == "raw":
        process_raw(args.src, args.dst)
    elif args.stage == "db":
        process_db(args.src, args.dst, args.occlusion, args.smpl)
    else:
        process_isaac(args.src, args.dst)


if __name__ == "__main__":
    main()
