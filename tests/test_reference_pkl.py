"""Real-data-format proof: the reference's converted-AMASS pickle schema
round-trips through our loaders into training (VERDICT round-1 item 6).

The fixture reproduces the EXACT output of the reference's
scripts/data_process/convert_amass_isaac.py:26-143 — keys pose_quat_global /
pose_quat / trans_orig / root_trans_offset (a torch tensor, as the
reference stores it) / beta / gender / pose_aa / fps, dumped with joblib —
and then: load_motion_file -> build_motion_data -> a 2-epoch CLI training
run with env.motion_file pointing at the pickle."""

import json
import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion import build_motion_data
from pulse_tpu.motion.loader import load_motion_file
from pulse_tpu.motion.reference_format import (
    MUJOCO_JOINT_NAMES,
    convert_amass_entry,
    save_reference_pkl,
    smpl_to_mujoco_index,
)


def make_amass_like_sequence(B=45, seed=0):
    """Smooth SMPL-order axis-angle walk-ish sequence + y-up translation."""
    rng = np.random.RandomState(seed)
    t = np.linspace(0, 4 * np.pi, B)[:, None]
    freq = rng.uniform(0.5, 2.0, (1, 72))
    amp = rng.uniform(0.0, 0.35, (1, 72))
    pose_aa = (amp * np.sin(freq * t + rng.uniform(0, np.pi, (1, 72))))
    # y-up root orientation (AMASS convention): face up the y axis
    pose_aa[:, :3] = np.asarray([np.pi / 2, 0, 0]) + 0.1 * np.sin(t[:, :1])
    trans = np.stack(
        [0.02 * np.arange(B), np.full(B, 0.91), 0.01 * np.sin(np.arange(B))],
        axis=1,
    )
    return pose_aa.astype(np.float64), trans.astype(np.float64)


@pytest.fixture(scope="module")
def spec():
    return load_smpl_humanoid()


@pytest.fixture(scope="module")
def ref_pkl(spec, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("amass") / "amass_isaac_fixture.pkl")
    db = {}
    for i in range(3):
        pose_aa, trans = make_amass_like_sequence(B=40 + 5 * i, seed=i)
        entry = convert_amass_entry(pose_aa, trans, spec.skeleton, fps=30.0)
        # the reference stores root_trans_offset as a torch tensor
        # (convert_amass_isaac.py:102,134) — keep that quirk in the fixture
        entry["root_trans_offset"] = torch.from_numpy(entry["root_trans_offset"])
        db[f"0-FIXTURE_subject{i}_walk"] = entry
    return save_reference_pkl(path, db)


def test_schema_exact(ref_pkl):
    import joblib

    db = joblib.load(ref_pkl)
    assert len(db) == 3
    entry = next(iter(db.values()))
    assert set(entry) == {
        "pose_quat_global", "pose_quat", "trans_orig", "root_trans_offset",
        "beta", "gender", "pose_aa", "fps",
    }
    B = entry["pose_quat"].shape[0]
    assert entry["pose_quat"].shape == (B, 24, 4)
    assert entry["pose_quat_global"].shape == (B, 24, 4)
    assert isinstance(entry["root_trans_offset"], torch.Tensor)
    assert entry["pose_aa"].shape == (B, 72)
    assert entry["gender"] == "neutral"


def test_smpl_to_mujoco_order_matches_reference():
    """The joint reorder must equal the reference's literal list."""
    assert MUJOCO_JOINT_NAMES[:5] == ("Pelvis", "L_Hip", "L_Knee", "L_Ankle", "L_Toe")
    idx = smpl_to_mujoco_index()
    assert sorted(idx) == list(range(24))
    assert idx[0] == 0  # Pelvis
    assert idx[1] == 1  # L_Hip is SMPL joint 1


def test_load_and_fk_consistency(ref_pkl, spec):
    """build_motion_data's FK of the loaded locals reproduces the stored
    pose_quat_global — proving local/global/base-rot conventions agree."""
    clips = load_motion_file(ref_pkl, spec.skeleton)
    assert len(clips) == 3
    motion = build_motion_data(spec.skeleton, clips)

    import joblib

    db = joblib.load(ref_pkl)
    entry = db["0-FIXTURE_subject0_walk"]
    B = entry["pose_quat"].shape[0]
    start = int(np.asarray(motion.length_starts[0]))
    grs = np.asarray(motion.grs[start : start + B])
    want = entry["pose_quat_global"]
    sign = np.sign(np.sum(grs * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(grs * sign, want, atol=2e-5)
    # root positions = root_trans_offset
    gts = np.asarray(motion.gts[start : start + B, 0])
    np.testing.assert_allclose(gts, entry["root_trans_offset"].numpy(), atol=1e-5)


def test_train_from_reference_pkl(ref_pkl, tmp_path):
    """env.motion_file=<reference pkl> trains end to end (2 epochs)."""
    from pulse_tpu import run as run_mod

    out = str(tmp_path / "out")
    run_mod.main([
        "env=im", "learning=im_ppo", "num_envs=2", "max_epochs=2",
        "log_frequency=1", "save_frequency=0", f"output_dir={out}",
        "exp_name=refpkl", f"env.motion_file={ref_pkl}",
        "learning.horizon_length=3", "learning.minibatch_size=6",
        "learning.mini_epochs=1",
        "learning.actor_units=[16]", "learning.critic_units=[16]",
    ])
    metrics = [
        json.loads(l) for l in open(os.path.join(out, "refpkl", "metrics.jsonl"))
    ]
    assert len(metrics) == 2
    assert np.isfinite(metrics[-1]["reward_mean"])


def test_process_amass_pipeline(tmp_path, spec):
    """raw -> db (occlusion filter) -> isaac stages of scripts/process_amass.py
    on synthetic AMASS-format npz files (≙ process_amass_raw/db +
    convert_amass_isaac)."""
    import joblib
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import process_amass

    root = tmp_path / "amass" / "FIXDB" / "subj"
    root.mkdir(parents=True)
    for i, frames in enumerate([240, 480, 30]):
        pose_aa, trans = make_amass_like_sequence(B=frames, seed=i)
        poses = np.concatenate([pose_aa, np.zeros((frames, 156 - 72))], axis=1)
        np.savez(
            root / f"seq{i}_poses.npz",
            poses=poses, trans=trans, betas=np.zeros(16),
            gender="neutral", mocap_framerate=60.0,
        )

    raw_pkl = str(tmp_path / "raw.pkl")
    db_pkl = str(tmp_path / "db.pkl")
    isaac_pkl = str(tmp_path / "isaac.pkl")
    raw = process_amass.process_raw(str(tmp_path / "amass"), raw_pkl)
    assert len(raw) == 3

    # occlusion annotations: truncate seq0, drop seq1 entirely
    keys = sorted(raw)
    occl = {
        "0-" + keys[0]: {"issue": "sitting", "idxes": [40]},
        "0-" + keys[1]: {"issue": "occluded"},
    }
    occl_pkl = str(tmp_path / "occl.pkl")
    joblib.dump(occl, occl_pkl)

    db = process_amass.process_db(raw_pkl, db_pkl, occlusion_file=occl_pkl)
    # seq1 dropped (irrecoverable), seq2 survives (30 raw -> 15 @30fps... <10? no: 30/2=15 >= 10)
    assert "0-" + keys[1] not in db
    assert db["0-" + keys[0]]["pose_aa"].shape[0] == 40  # truncated at bound

    isaac = process_amass.process_isaac(db_pkl, isaac_pkl)
    assert set(isaac) == set(db)
    clips = load_motion_file(isaac_pkl, spec.skeleton)
    motion = build_motion_data(spec.skeleton, clips)
    assert int(motion.num_motions) == len(db)


def test_convert_pose_data(tmp_path, spec):
    """Single-pose + MDM converters (≙ convert_data_smpl/convert_data_mdm)."""
    import joblib
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import convert_pose_data

    rng = np.random.RandomState(0)
    pose_aa, trans = make_amass_like_sequence(B=12, seed=0)
    src = {
        "motionA": {"pose_aa": pose_aa, "trans": trans},
        "poseB": {"pose_aa": pose_aa[0], "trans": trans[0]},  # static pose
    }
    in_pkl, out_pkl = str(tmp_path / "in.pkl"), str(tmp_path / "out.pkl")
    joblib.dump(src, in_pkl)
    out = convert_pose_data.convert(in_pkl, out_pkl, "smpl")
    assert out["motionA"]["pose_quat"].shape == (12, 24, 4)
    assert out["poseB"]["pose_quat"].shape == (2, 24, 4)  # static pose held
    clips = load_motion_file(out_pkl, spec.skeleton)
    assert len(clips) == 2

    # MDM euler format round-trips through the same stage
    euler = np.degrees(pose_aa.reshape(12, 24, 3))  # crude but valid eulers
    mdm = {"gen0": {"pose_euler": euler, "root_translation": trans}}
    joblib.dump(mdm, in_pkl)
    out2 = convert_pose_data.convert(in_pkl, out_pkl, "mdm")
    assert out2["gen0"]["pose_quat"].shape == (12, 24, 4)
