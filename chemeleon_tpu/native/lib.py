"""ctypes bindings + lazy build for chemtpu_native.cpp."""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).with_name("chemtpu_native.cpp")
_SO = Path(os.environ.get("CHEMELEON_TPU_NATIVE_SO",
                          _SRC.with_name("libchemtpu.so")))
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"chemtpu_native build failed (pure-Python fallbacks active): "
              f"{msg}", file=sys.stderr)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            print(f"chemtpu_native load failed: {e}", file=sys.stderr)
            _failed = True
            return None
        lib.ctpu_niggli_reduce.restype = ctypes.c_int
        lib.ctpu_niggli_reduce.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int]
        lib.ctpu_distance_matrix.restype = None
        lib.ctpu_distance_matrix.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        lib.ctpu_min_pair_distance.restype = ctypes.c_double
        lib.ctpu_min_pair_distance.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double)]
        lib.ctpu_structures_fit.restype = ctypes.c_int
        lib.ctpu_structures_fit.argtypes = [
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def niggli_reduce(matrix: np.ndarray, tol: float = 1e-5,
                  max_iter: int = 100) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    m = np.ascontiguousarray(matrix, dtype=np.float64).copy()
    rc = lib.ctpu_niggli_reduce(_dptr(m), tol, max_iter)
    if rc != 0:
        raise ValueError("Niggli reduction did not converge")
    return m.reshape(3, 3)


def distance_matrix(lattice: np.ndarray, frac: np.ndarray) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(frac)
    lat = np.ascontiguousarray(lattice, dtype=np.float64)
    fr = np.ascontiguousarray(frac, dtype=np.float64)
    out = np.empty((n, n), dtype=np.float64)
    lib.ctpu_distance_matrix(n, _dptr(lat), _dptr(fr), _dptr(out))
    return out


def min_pair_distance(lattice: np.ndarray, frac: np.ndarray) -> float:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    lat = np.ascontiguousarray(lattice, dtype=np.float64)
    fr = np.ascontiguousarray(frac, dtype=np.float64)
    return float(lib.ctpu_min_pair_distance(len(frac), _dptr(lat), _dptr(fr)))


def structures_fit(lat1, frac1, types1, lat2, frac2, types2,
                   ltol: float = 0.2, stol: float = 0.3,
                   angle_tol: float = 5.0, scale: bool = True) -> bool:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    n = len(frac1)
    a = [np.ascontiguousarray(x, dtype=np.float64)
         for x in (lat1, frac1, lat2, frac2)]
    t1 = np.ascontiguousarray(types1, dtype=np.int32)
    t2 = np.ascontiguousarray(types2, dtype=np.int32)
    rc = lib.ctpu_structures_fit(
        n, _dptr(a[0]), _dptr(a[1]), _iptr(t1),
        _dptr(a[2]), _dptr(a[3]), _iptr(t2),
        ltol, stol, angle_tol, int(scale))
    return bool(rc)
