"""ctypes bindings for the native NIfTI feeder (nifti_feeder.cc).

Builds the shared library on first use (g++, ~2 s) into the package dir;
callers fall back to the pure-numpy path when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnifti_feeder.so")
_SRC = os.path.join(_DIR, "nifti_feeder.cc")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO,
                     "-lz"],
                    check=True, capture_output=True, timeout=120)
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.nf_read_volume.restype = ctypes.c_int
        lib.nf_read_volume.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
        lib.nf_preprocess.restype = ctypes.c_int
        lib.nf_preprocess.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float)]
        lib.nf_resize_nearest.restype = ctypes.c_int
        lib.nf_resize_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
        lib.nf_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_volume_native(path: str):
    """-> (array (z, y, x) float32, spacing (sx, sy, sz))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native feeder unavailable")
    dims = (ctypes.c_int64 * 3)()
    spacing = (ctypes.c_float * 3)()
    data = ctypes.POINTER(ctypes.c_float)()
    rc = lib.nf_read_volume(path.encode(), dims, spacing, ctypes.byref(data))
    if rc != 0:
        raise IOError(f"nf_read_volume({path}) failed with code {rc}")
    z, y, x = dims[0], dims[1], dims[2]
    arr = np.ctypeslib.as_array(data, shape=(z, y, x)).copy()
    lib.nf_free(data)
    return arr, tuple(spacing)


def preprocess_volume_native(vol: np.ndarray, out_hw: int, modality: str,
                             ct_mean: float = 0.0, ct_std: float = 1.0
                             ) -> np.ndarray:
    """Per-slice bilinear resize + normalization, C++ single pass."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native feeder unavailable")
    vol = np.ascontiguousarray(vol, np.float32)
    z, y, x = vol.shape
    out = np.empty((z, out_hw, out_hw), np.float32)
    mode = 1 if modality == "MR" else 0
    rc = lib.nf_preprocess(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), z, y, x, out_hw,
        mode, ct_mean, ct_std,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"nf_preprocess failed with code {rc}")
    return out


def resize_labels_native(vol: np.ndarray, out_hw: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native feeder unavailable")
    vol = np.ascontiguousarray(vol, np.float32)
    z, y, x = vol.shape
    out = np.empty((z, out_hw, out_hw), np.float32)
    rc = lib.nf_resize_nearest(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), z, y, x, out_hw,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise RuntimeError(f"nf_resize_nearest failed with code {rc}")
    return out
