"""Property-based fuzzing of the real-data formats (round-2 VERDICT #8).

Randomized databases push the reference-pickle round trip
(motion/reference_format.py <-> motion/loader.py) and the
scripts/process_amass.py stages through the edge cases a real AMASS dump
contains: T=1 static poses, odd mocap framerates, truncated occlusion
bounds at the drop threshold, torch-tensor-valued fields, all three
genders (incl. bytes-encoded, as AMASS npz stores them), beta != 0, and
short/odd beta vectors.

≙ reference surfaces: scripts/data_process/process_amass_db.py:159-224,
convert_amass_isaac.py:26-143, phc/utils/motion_lib_base.py:33-44
(the Tensor.numpy monkey-patch exists because real dbs mix torch/numpy).
"""

import os
import sys

import numpy as np
import pytest
import torch

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion import build_motion_data
from pulse_tpu.motion.loader import load_motion_file
from pulse_tpu.motion.reference_format import (
    convert_amass_entry,
    save_reference_pkl,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import process_amass  # noqa: E402


@pytest.fixture(scope="module")
def spec():
    return load_smpl_humanoid()


def random_sequence(rng, T, rough=True):
    """Unsmoothed random axis-angle poses — harsher than the walk fixture."""
    pose_aa = rng.uniform(-0.6, 0.6, (T, 72))
    pose_aa[:, :3] = np.asarray([np.pi / 2, 0, 0]) + 0.2 * rng.standard_normal(
        (T, 3)
    )
    trans = rng.uniform(-1, 1, (T, 3)) + np.asarray([0, 0.9, 0])
    return pose_aa, trans


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_convert_roundtrip_fuzz(spec, tmp_path, seed):
    """Random clips with edge-case lengths/fps/betas/genders round-trip
    through save -> load_motion_file -> build_motion_data with FK parity."""
    rng = np.random.default_rng(seed)
    lengths = [1, 2, 7, 33]
    fpses = [24.0, 59.94, 30.0, 100.0]
    genders = ["neutral", "male", "female", "neutral"]
    db = {}
    for i, (T, fps, gender) in enumerate(zip(lengths, fpses, genders)):
        pose_aa, trans = random_sequence(rng, T)
        beta = rng.standard_normal(10)
        entry = convert_amass_entry(
            pose_aa, trans, spec.skeleton, fps=fps, beta=beta, gender=gender
        )
        if i % 2 == 0:  # the reference mixes torch tensors into entries
            entry["root_trans_offset"] = torch.from_numpy(
                entry["root_trans_offset"]
            )
            entry["pose_quat"] = torch.from_numpy(entry["pose_quat"])
        db[f"0-FUZZ_s{seed}_c{i}"] = entry
    path = str(tmp_path / f"fuzz{seed}.pkl")
    save_reference_pkl(path, db)

    clips = load_motion_file(path, spec.skeleton)
    assert len(clips) == len(db)
    motion = build_motion_data(spec.skeleton, clips)
    assert int(motion.num_motions) == len(db)
    for leaf in [motion.gts, motion.grs, motion.gvs, motion.gavs]:
        assert np.all(np.isfinite(np.asarray(leaf)))

    # FK parity: stored pose_quat_global == our FK of the loaded locals
    for i, (key, entry) in enumerate(db.items()):
        want = np.asarray(entry["pose_quat_global"])
        T = want.shape[0]
        start = int(np.asarray(motion.length_starts[i]))
        grs = np.asarray(motion.grs[start : start + T])
        sign = np.sign(
            np.sum(grs * want, axis=-1, keepdims=True)
            + 1e-12  # break sign ties deterministically
        )
        np.testing.assert_allclose(grs * sign, want, atol=3e-5)


def test_static_pose_held_two_frames(spec, tmp_path):
    """T=1 clips are held for 2 frames so velocities are defined."""
    rng = np.random.default_rng(7)
    pose_aa, trans = random_sequence(rng, 1)
    entry = convert_amass_entry(pose_aa, trans, spec.skeleton, fps=30.0)
    path = str(tmp_path / "static.pkl")
    save_reference_pkl(path, {"0-STATIC": entry})
    clips = load_motion_file(path, spec.skeleton)
    assert clips[0]["local_rotation"].shape[0] == 2
    np.testing.assert_array_equal(
        clips[0]["local_rotation"][0], clips[0]["local_rotation"][1]
    )
    motion = build_motion_data(spec.skeleton, clips)
    assert np.all(np.isfinite(np.asarray(motion.gvs)))
    # a held pose has (near-)zero velocity
    assert float(np.abs(np.asarray(motion.gvs)).max()) < 1e-4


def _raw_db(rng, framerates, genders, T=120, torch_fields=False):
    db = {}
    for i, (fr, g) in enumerate(zip(framerates, genders)):
        pose = rng.uniform(-0.5, 0.5, (T, 156))
        trans = rng.uniform(-1, 1, (T, 3))
        betas = rng.standard_normal(16)
        if torch_fields:
            pose, trans, betas = map(
                lambda a: torch.from_numpy(np.asarray(a)), (pose, trans, betas)
            )
        db[f"FUZZ_subj_{i}"] = {
            "poses": pose,
            "trans": trans,
            "betas": betas,
            "gender": g,
            "mocap_framerate": fr,
        }
    return db


def test_process_db_odd_framerates(tmp_path):
    """skip = max(int(fr/30), 1) — the reference's exact downsample rule
    (process_amass_db.py:183), including fr<30 kept as-is."""
    import joblib

    rng = np.random.default_rng(0)
    framerates = [24.0, 59.94, 100.0, 250.0]
    raw = _raw_db(rng, framerates, ["neutral"] * 4, T=120)
    raw_pkl, db_pkl = str(tmp_path / "raw.pkl"), str(tmp_path / "db.pkl")
    joblib.dump(raw, raw_pkl)
    db = process_amass.process_db(raw_pkl, db_pkl)
    skips = [max(int(fr / 30), 1) for fr in framerates]
    for i, skip in enumerate(skips):
        got = db[f"0-FUZZ_subj_{i}"]["pose_aa"].shape[0]
        assert got == len(range(0, 120, skip))


def test_process_db_torch_tensor_fields(tmp_path):
    """Raw dbs that store torch tensors (reference monkey-patches
    Tensor.numpy for this) process identically."""
    import joblib

    rng = np.random.default_rng(1)
    raw = _raw_db(rng, [60.0], ["female"], T=40, torch_fields=True)
    raw_pkl, db_pkl = str(tmp_path / "raw.pkl"), str(tmp_path / "db.pkl")
    joblib.dump(raw, raw_pkl)
    db = process_amass.process_db(raw_pkl, db_pkl)
    entry = db["0-FUZZ_subj_0"]
    assert isinstance(entry["pose_aa"], np.ndarray)
    assert entry["pose_aa"].shape == (20, 72)
    assert entry["beta"].shape == (10,)
    assert entry["gender"] == "female"


def test_process_db_occlusion_bounds(tmp_path):
    """Bound threshold edges: >=10 truncates, <10 drops, other issues drop,
    missing idxes drops (process_amass_db.py:166-181)."""
    import joblib

    rng = np.random.default_rng(2)
    raw = _raw_db(rng, [30.0] * 5, ["neutral"] * 5, T=60)
    keys = sorted(raw)
    occl = {
        "0-" + keys[0]: {"issue": "sitting", "idxes": [10]},   # kept, 10 frames
        "0-" + keys[1]: {"issue": "airborne", "idxes": [9]},   # dropped (<10)
        "0-" + keys[2]: {"issue": "sitting", "idxes": [999]},  # kept, full 60
        "0-" + keys[3]: {"issue": "occluded"},                  # dropped
        # keys[4] unannotated -> kept full
    }
    raw_pkl = str(tmp_path / "raw.pkl")
    db_pkl = str(tmp_path / "db.pkl")
    occl_pkl = str(tmp_path / "occl.pkl")
    joblib.dump(raw, raw_pkl)
    joblib.dump(occl, occl_pkl)
    db = process_amass.process_db(raw_pkl, db_pkl, occlusion_file=occl_pkl)
    assert db["0-" + keys[0]]["pose_aa"].shape[0] == 10
    assert "0-" + keys[1] not in db
    assert db["0-" + keys[2]]["pose_aa"].shape[0] == 60
    assert "0-" + keys[3] not in db
    assert db["0-" + keys[4]]["pose_aa"].shape[0] == 60


def test_short_beta_padded_and_gender_bytes(tmp_path, spec):
    """betas shorter than 10 pad with zeros; bytes genders decode (AMASS
    npz stores gender as bytes)."""
    import joblib

    rng = np.random.default_rng(3)
    raw = _raw_db(rng, [30.0], ["male"], T=30)
    raw["FUZZ_subj_0"]["betas"] = np.asarray([0.5, -0.3])
    raw_pkl, db_pkl = str(tmp_path / "raw.pkl"), str(tmp_path / "db.pkl")
    joblib.dump(raw, raw_pkl)
    db = process_amass.process_db(raw_pkl, db_pkl)
    beta = db["0-FUZZ_subj_0"]["beta"]
    assert beta.shape == (10,)
    np.testing.assert_allclose(beta[:2], [0.5, -0.3])
    assert np.all(beta[2:] == 0)

    # bytes gender through the raw stage
    root = tmp_path / "amass" / "DS" / "s1"
    root.mkdir(parents=True)
    np.savez(
        root / "a_poses.npz",
        poses=rng.uniform(-0.3, 0.3, (30, 156)),
        trans=rng.uniform(-1, 1, (30, 3)),
        betas=rng.standard_normal(16),
        gender=np.bytes_(b"female"),
        mocap_framerate=60.0,
    )
    raw2 = process_amass.process_raw(str(tmp_path / "amass"), str(tmp_path / "raw2.pkl"))
    assert raw2["DS_s1_a"]["gender"] == "female"

    # the full chain on the padded-beta db still trains a motion store
    isaac_pkl = str(tmp_path / "isaac.pkl")
    isaac = process_amass.process_isaac(db_pkl, isaac_pkl)
    assert isaac["0-FUZZ_subj_0"]["beta"].shape == (10,)
    clips = load_motion_file(isaac_pkl, spec.skeleton)
    motion = build_motion_data(spec.skeleton, clips)
    assert np.all(np.isfinite(np.asarray(motion.gts)))
