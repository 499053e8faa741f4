"""ctypes bindings (and on-demand build) for runtime/cpp/hostops.cpp."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "hostops.cpp")
_SO = os.path.join(_HERE, "cpp", "libhostops.so")

_lib = None
_tried = False
_lock = threading.Lock()


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.edt.argtypes = [
                np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.signed_distance_maps.argtypes = [
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.boundary_weights.argtypes = [
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def edt_to_nonzero(seeds: np.ndarray) -> np.ndarray:
    """Exact euclidean distance to the nearest nonzero pixel of ``seeds``."""
    lib = _load()
    assert lib is not None
    seeds = np.ascontiguousarray(seeds, np.uint8)
    h, w = seeds.shape
    out = np.empty((h, w), np.float32)
    lib.edt(seeds, out, h, w)
    return out


def signed_distance_maps(label: np.ndarray, num_classes: int = 3) -> np.ndarray:
    """[H, W] int labels -> [H, W, C] signed distance maps (fused, native)."""
    lib = _load()
    assert lib is not None
    label = np.ascontiguousarray(label, np.int32)
    h, w = label.shape
    out = np.empty((h, w, num_classes), np.float32)
    lib.signed_distance_maps(label, out, h, w, num_classes)
    return out


def boundary_weights(label: np.ndarray, compat_dilate: bool = True) -> np.ndarray:
    lib = _load()
    assert lib is not None
    label = np.ascontiguousarray(label, np.int32)
    h, w = label.shape
    out = np.empty((h, w), np.float32)
    lib.boundary_weights(label, out, h, w, int(compat_dilate))
    return out
