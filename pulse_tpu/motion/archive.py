"""ctypes bindings for the native motion-archive codec (native/motion_codec.cc).

Write/read packed binary clip archives; mmap-backed bulk reads feed
MotionData's flat device layout directly. Falls back to a pure-numpy
implementation of the same format when the shared library isn't built
(tools/build_native.sh builds it; import never fails)."""

from __future__ import annotations

import ctypes
import os
import struct as pystruct

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "native", "libmotion_codec.so")
_MAGIC = 0x4E544D45534C5550
_VERSION = 1


def _load_lib():
    try:
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
    except OSError:
        return None
    lib.motion_archive_open.restype = ctypes.c_void_p
    lib.motion_archive_open.argtypes = [ctypes.c_char_p]
    lib.motion_archive_num_clips.restype = ctypes.c_uint32
    lib.motion_archive_num_clips.argtypes = [ctypes.c_void_p]
    lib.motion_archive_num_joints.restype = ctypes.c_uint32
    lib.motion_archive_num_joints.argtypes = [ctypes.c_void_p]
    lib.motion_archive_num_frames.restype = ctypes.c_uint32
    lib.motion_archive_num_frames.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.motion_archive_fps.restype = ctypes.c_float
    lib.motion_archive_fps.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
    lib.motion_archive_read_clip.restype = ctypes.c_int
    lib.motion_archive_read_clip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.motion_archive_read_all.restype = ctypes.c_int
    lib.motion_archive_read_all.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.motion_archive_close.argtypes = [ctypes.c_void_p]
    lib.motion_archive_write.restype = ctypes.c_int
    lib.motion_archive_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
    ]
    return lib


_LIB = _load_lib()


def have_native() -> bool:
    return _LIB is not None


def write_archive(path: str, clips: list[dict]) -> None:
    """clips: [{"fps", "local_rotation" [T,J,4], "root_translation" [T,3]}]."""
    J = clips[0]["local_rotation"].shape[1]
    if _LIB is not None:
        n = len(clips)
        fps = np.asarray([c["fps"] for c in clips], np.float32)
        nf = np.asarray([c["local_rotation"].shape[0] for c in clips], np.uint32)
        rots = [np.ascontiguousarray(c["local_rotation"], np.float32) for c in clips]
        trans = [np.ascontiguousarray(c["root_translation"], np.float32) for c in clips]
        rot_ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
            *[r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for r in rots]
        )
        trans_ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
            *[t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for t in trans]
        )
        rc = _LIB.motion_archive_write(
            path.encode(), n, J,
            fps.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rot_ptrs, trans_ptrs,
        )
        if rc != 0:
            raise IOError(f"motion_archive_write failed: {rc}")
        return
    # numpy fallback, identical byte layout
    with open(path, "wb") as fh:
        fh.write(pystruct.pack("<QIIII", _MAGIC, _VERSION, len(clips), J, 0)[:24])
        for c in clips:
            fh.write(pystruct.pack("<fI", float(c["fps"]), c["local_rotation"].shape[0]))
        for c in clips:
            fh.write(np.ascontiguousarray(c["local_rotation"], "<f4").tobytes())
            fh.write(np.ascontiguousarray(c["root_translation"], "<f4").tobytes())


def read_archive(path: str) -> list[dict]:
    if _LIB is not None:
        h = _LIB.motion_archive_open(path.encode())
        if not h:
            raise IOError(f"cannot open motion archive {path}")
        try:
            n = _LIB.motion_archive_num_clips(h)
            J = _LIB.motion_archive_num_joints(h)
            clips = []
            for i in range(n):
                T = _LIB.motion_archive_num_frames(h, i)
                rot = np.empty((T, J, 4), np.float32)
                trans = np.empty((T, 3), np.float32)
                rc = _LIB.motion_archive_read_clip(
                    h, i,
                    rot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    trans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                )
                if rc != 0:
                    raise IOError(f"read_clip({i}) failed: {rc}")
                clips.append(
                    {
                        "fps": float(_LIB.motion_archive_fps(h, i)),
                        "local_rotation": rot,
                        "root_translation": trans,
                    }
                )
            return clips
        finally:
            _LIB.motion_archive_close(h)
    # numpy fallback
    with open(path, "rb") as fh:
        magic, version, n, J, _ = pystruct.unpack("<QIIII", fh.read(24))
        if magic != _MAGIC or version != _VERSION:
            raise IOError(f"{path}: bad magic/version")
        metas = [pystruct.unpack("<fI", fh.read(8)) for _ in range(n)]
        clips = []
        for fps, T in metas:
            rot = np.frombuffer(fh.read(T * J * 4 * 4), "<f4").reshape(T, J, 4)
            trans = np.frombuffer(fh.read(T * 3 * 4), "<f4").reshape(T, 3)
            clips.append(
                {"fps": float(fps), "local_rotation": rot.copy(), "root_translation": trans.copy()}
            )
        return clips
