"""Native motion-archive codec roundtrip (C++ lib + numpy fallback parity)."""

import numpy as np
import pytest

from pulse_tpu.assets import load_smpl_humanoid
from pulse_tpu.motion import make_synthetic_clips
from pulse_tpu.motion import archive


def clips():
    tree = load_smpl_humanoid().skeleton
    return make_synthetic_clips(tree, num_clips=3, seconds=1.0)


class TestArchive:
    def test_native_lib_built(self):
        assert archive.have_native(), "run tools/build_native.sh"

    def test_roundtrip_native(self, tmp_path):
        cs = clips()
        path = str(tmp_path / "a.mtn")
        archive.write_archive(path, cs)
        out = archive.read_archive(path)
        assert len(out) == 3
        for a, b in zip(cs, out):
            assert a["fps"] == b["fps"]
            np.testing.assert_array_equal(a["local_rotation"], b["local_rotation"])
            np.testing.assert_array_equal(a["root_translation"], b["root_translation"])

    def test_fallback_reads_native_file(self, tmp_path, monkeypatch):
        cs = clips()
        path = str(tmp_path / "b.mtn")
        archive.write_archive(path, cs)          # native write
        monkeypatch.setattr(archive, "_LIB", None)  # force numpy reader
        out = archive.read_archive(path)
        np.testing.assert_array_equal(cs[1]["local_rotation"], out[1]["local_rotation"])

    def test_native_reads_fallback_file(self, tmp_path, monkeypatch):
        cs = clips()
        path = str(tmp_path / "c.mtn")
        lib = archive._LIB
        monkeypatch.setattr(archive, "_LIB", None)
        archive.write_archive(path, cs)          # numpy write
        monkeypatch.setattr(archive, "_LIB", lib)
        out = archive.read_archive(path)
        np.testing.assert_array_equal(cs[2]["root_translation"], out[2]["root_translation"])
