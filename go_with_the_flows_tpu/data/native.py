"""ctypes bindings for the native C++ surface sampler (csrc/sampler.cpp).

Builds the shared library on demand with g++ (no pybind11 in this
environment; plain C ABI + ctypes). Falls back cleanly when no compiler
is available — `sample_cloud` in cloud_sampling.py keeps the pure-numpy
path as the reference implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "csrc", "sampler.cpp")
_LIB = os.path.join(_REPO_ROOT, "csrc", "libgwtf_sampler.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-o", _LIB, _SRC, "-pthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native sampler; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not os.path.exists(_LIB) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    ):
        if not _build():
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _load_failed = True
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.gwtf_sample_cloud.argtypes = [
        f32p, ctypes.c_int64, u32p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, f32p,
    ]
    lib.gwtf_sample_cloud.restype = None
    lib.gwtf_sample_batch.argtypes = [
        f32p, i64p, u32p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_int, f32p,
    ]
    lib.gwtf_sample_batch.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def sample_cloud_native(
    vertices: np.ndarray, faces: np.ndarray, n_samples: int, seed: int
) -> np.ndarray:
    """(3, n_samples) float32 surface samples via the C++ sampler."""
    lib = get_lib()
    assert lib is not None
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.uint32)
    out = np.empty((3, n_samples), np.float32)
    lib.gwtf_sample_cloud(
        vertices, len(vertices), faces, len(faces),
        n_samples, np.uint64(seed & 0xFFFFFFFFFFFFFFFF), out,
    )
    return out


def sample_batch_native(
    vertices: np.ndarray, v_bounds: np.ndarray,
    faces: np.ndarray, f_bounds: np.ndarray,
    n_samples: int, seed: int, n_threads: int = 0,
) -> np.ndarray:
    """(batch, 3, n_samples) surface samples over a ragged mesh batch,
    multithreaded."""
    lib = get_lib()
    assert lib is not None
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.uint32)
    v_bounds = np.ascontiguousarray(v_bounds, np.int64)
    f_bounds = np.ascontiguousarray(f_bounds, np.int64)
    batch = len(v_bounds) - 1
    out = np.empty((batch, 3, n_samples), np.float32)
    lib.gwtf_sample_batch(
        vertices, v_bounds, faces, f_bounds, batch, n_samples,
        np.uint64(seed & 0xFFFFFFFFFFFFFFFF), n_threads, out,
    )
    return out
