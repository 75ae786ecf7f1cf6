"""Native (C++) clip-decode layer.

The reference's host-side hot loop is per-frame image decode inside
``Dataset.__getitem__`` (SURVEY.md §3.2: PIL/skimage per frame, serial
between device calls).  ``io.cc`` replaces it with one C call per clip —
a thread pool decodes every frame (libpng/libjpeg/libwebp) straight into a
preallocated numpy buffer in the pipeline's layout ([N,3,H,W] f32 RGB,
[N,H,W] f32 depth), skipping per-frame Python dispatch, PIL object
round-trips, and the HWC→CHW transpose pass.

The shared library is compiled on first use with the system toolchain and
cached next to the source (keyed on source mtime).  Everything degrades
gracefully: if g++ or the codec dev headers are missing, ``available()``
is False and callers fall back to the PIL path — behavior, tested in
tests/test_native_io.py, is identical either way.

Thread-safety: the build is atomic (temp file + os.rename), so concurrent
pytest-xdist workers can race the first build harmlessly.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "io.cc")
_LIB = osp.join(_DIR, "_libunigeo_io.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_ERRORS = {
    -1: "cannot open file",
    -2: "unknown or unsupported image format",
    -3: "codec decode failure",
    -4: "decoded dims differ from expected dims",
    -5: "depth file is not 8/16-bit grayscale PNG",
}


class NativeIOError(RuntimeError):
    def __init__(self, code: int, context: str = ""):
        self.code = code
        msg = _ERRORS.get(code, f"native io error {code}")
        super().__init__(f"{msg}{': ' + context if context else ''}")


def _build() -> bool:
    """Compile io.cc → _libunigeo_io.so; returns success."""
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-lpng", "-ljpeg", "-lwebp", "-lpthread",
    ]
    tmp = None
    try:
        # inside the try: a read-only package dir (root-owned install,
        # read-only container FS) must degrade to the PIL path, not raise
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        subprocess.run(
            cmd + ["-o", tmp], check=True, capture_output=True, timeout=120
        )
        os.rename(tmp, _LIB)  # atomic: concurrent builders race harmlessly
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        if tmp is not None:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return False


def _stale() -> bool:
    try:
        return os.stat(_LIB).st_mtime < os.stat(_SRC).st_mtime
    except OSError:
        return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed or os.environ.get("UNIGEO_NATIVE_IO") == "0":
        return None
    if _stale() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _load_failed = True
        return None

    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    i32 = ctypes.c_int32
    lib.ug_image_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i32), ctypes.POINTER(i32),
        ctypes.POINTER(i32),
    ]
    lib.ug_image_info.restype = ctypes.c_int
    lib.ug_decode_clip_rgb_f32.argtypes = [
        c_char_pp, i32, i32, i32, ctypes.POINTER(ctypes.c_float), i32,
    ]
    lib.ug_decode_clip_rgb_f32.restype = ctypes.c_int
    lib.ug_decode_clip_depth_f32.argtypes = [
        c_char_pp, i32, i32, i32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_float), i32,
    ]
    lib.ug_decode_clip_depth_f32.restype = ctypes.c_int
    lib.ug_decode_clip_normal_f32.argtypes = [
        c_char_pp, i32, i32, i32, ctypes.POINTER(ctypes.c_float), i32,
    ]
    lib.ug_decode_clip_normal_f32.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native decoder is built/loadable and not disabled
    (set UNIGEO_NATIVE_IO=0 to force the PIL path)."""
    return _load() is not None


def image_info(path: str):
    """(h, w, kind) without decoding pixels; kind 0=png8 1=jpeg 2=webp
    3=png16."""
    lib = _load()
    if lib is None:
        raise NativeIOError(-3, "native io unavailable")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    kind = ctypes.c_int32()
    rc = lib.ug_image_info(path.encode(), h, w, kind)
    if rc != 0:
        raise NativeIOError(rc, path)
    return h.value, w.value, kind.value


def _paths_array(paths: Sequence[str]):
    return (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])


def decode_clip_rgb(paths: Sequence[str], nthreads: int = 0) -> np.ndarray:
    """Clip of RGB frames → [N,3,H,W] float32 0..255 (dims from frame 0)."""
    lib = _load()
    if lib is None:
        raise NativeIOError(-3, "native io unavailable")
    h, w, _ = image_info(paths[0])
    out = np.empty((len(paths), 3, h, w), np.float32)
    rc = lib.ug_decode_clip_rgb_f32(
        _paths_array(paths), len(paths), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads,
    )
    if rc != 0:
        raise NativeIOError(rc, paths[0])
    return out


def decode_clip_depth(
    paths: Sequence[str], scale: float, nthreads: int = 0
) -> np.ndarray:
    """Clip of grayscale-PNG depth frames → [N,H,W] float32 (codes/scale)."""
    lib = _load()
    if lib is None:
        raise NativeIOError(-3, "native io unavailable")
    h, w, _ = image_info(paths[0])
    out = np.empty((len(paths), h, w), np.float32)
    rc = lib.ug_decode_clip_depth_f32(
        _paths_array(paths), len(paths), h, w, float(scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads,
    )
    if rc != 0:
        raise NativeIOError(rc, paths[0])
    return out


def decode_clip_normal(paths: Sequence[str], nthreads: int = 0) -> np.ndarray:
    """Clip of RGB-coded normal maps → [N,3,H,W] float32 in [-1,1] with the
    reference's zero-pixel invalid masking (scannetpp.py:115-122)."""
    lib = _load()
    if lib is None:
        raise NativeIOError(-3, "native io unavailable")
    h, w, _ = image_info(paths[0])
    out = np.empty((len(paths), 3, h, w), np.float32)
    rc = lib.ug_decode_clip_normal_f32(
        _paths_array(paths), len(paths), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nthreads,
    )
    if rc != 0:
        raise NativeIOError(rc, paths[0])
    return out
