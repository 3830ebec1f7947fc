"""Offline SMPL mesh renderer (scripts/render_smpl_mesh.py ≙ the
reference's o3d SMPL renderers, scripts/render_smpl_o3d.py): LBS posing of
the synthetic SMPL model over a reference-format motion pickle, drawn to
PNG frames headlessly."""

import os
import pickle

import numpy as np
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion.reference_format import (
    convert_amass_entry,
    save_reference_pkl,
)
from pulse_tpu.smpl.body_model import load_smpl_model
from pulse_tpu.smpl.synthetic import write_smpl_pickle


@pytest.fixture(scope="module")
def smpl_path(tmp_path_factory):
    spec = load_smpl_humanoid()
    p = tmp_path_factory.mktemp("smpl") / "SMPL_NEUTRAL.pkl"
    write_smpl_pickle(str(p), spec.skeleton)
    return str(p)


def test_synthetic_model_has_faces(smpl_path):
    model = load_smpl_model(smpl_path)
    assert model.faces is not None and len(model.faces) > 0
    assert model.faces.min() >= 0
    assert model.faces.max() < model.v_template.shape[0]


def test_render_frames_writes_pngs(smpl_path, tmp_path):
    from scripts.render_smpl_mesh import render_frames

    model = load_smpl_model(smpl_path)
    T = 6
    rng = np.random.RandomState(0)
    pose_aa = 0.1 * rng.randn(T, 72).astype(np.float32)
    trans = np.cumsum(0.02 * np.ones((T, 3), np.float32), axis=0)
    spec = load_smpl_humanoid()
    entry = convert_amass_entry(pose_aa, trans, spec.skeleton)
    out = tmp_path / "frames"
    paths = render_frames(
        model,
        np.asarray(entry["pose_quat"]),
        np.asarray(entry["root_trans_offset"]),
        np.asarray(entry["beta"]),
        str(out),
        stride=2,
        max_frames=2,
    )
    assert len(paths) == 2
    for p in paths:
        assert os.path.getsize(p) > 1000  # non-trivial PNG


def test_cli_main(smpl_path, tmp_path, monkeypatch):
    import scripts.render_smpl_mesh as rsm

    spec = load_smpl_humanoid()
    pose_aa = np.zeros((4, 72), np.float32)
    trans = np.tile(np.asarray([0, 0, 0.94], np.float32), (4, 1))
    entry = convert_amass_entry(pose_aa, trans, spec.skeleton)
    mpath = str(tmp_path / "motions.pkl")
    save_reference_pkl(mpath, {"clip_a": entry})
    out = str(tmp_path / "out")
    monkeypatch.setattr(
        "sys.argv",
        ["render_smpl_mesh.py", "--motion", mpath, "--smpl", smpl_path,
         "--clip", "clip_a", "--out", out, "--max-frames", "1"],
    )
    rsm.main()
    assert os.path.exists(os.path.join(out, "frame_0000.png"))
