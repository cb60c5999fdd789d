"""ctypes wrapper for the native multi-threshold merge core
(runtime/segmerge.cpp).

Compiles the shared library on first use (g++ ships in the toolchain);
``merge_segments`` returns None when the native path is unavailable so
ops/detection.py can fall back to its operation-identical Python loop.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["merge_segments", "lutz_deblend", "native_available"]

_RUNTIME_DIR = Path(__file__).resolve().parent
_SO_PATH = _RUNTIME_DIR / "libdvsegmerge.so"
_SRC_PATH = _RUNTIME_DIR / "segmerge.cpp"

_lib = None
_lib_error: str | None = None


def _build_library() -> Path:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC_PATH), "-o", str(_SO_PATH),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def _get_lib():
    global _lib, _lib_error
    if _lib is not None or _lib_error is not None:
        return _lib
    try:
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < _SRC_PATH.stat().st_mtime:
            _build_library()
        lib = ctypes.CDLL(str(_SO_PATH))
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.dvm_merge.restype = ctypes.c_int64
        lib.dvm_merge.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            i64p, i64p, f64p,
            f64p, f64p,
            i64p,
            ctypes.c_int64, ctypes.c_double, ctypes.c_double,
            i64p,
        ]
        lib.dvm_lutz.restype = ctypes.c_int64
        lib.dvm_lutz.argtypes = [
            ctypes.c_int64, ctypes.c_int64,
            f64p, i64p,
            i64p, i64p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double,
            i64p,
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        _lib_error = str(exc)
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def merge_segments(ea, eb, eh, peak, flux, order, nthr, thr, cont):
    """Native merge: returns the int64 roots array (len L), or None if the
    native library is unavailable.  ``flux`` is consumed (copied here)."""
    lib = _get_lib()
    if lib is None:
        return None
    L = len(peak)
    ea = np.ascontiguousarray(ea, np.int64)
    eb = np.ascontiguousarray(eb, np.int64)
    eh = np.ascontiguousarray(eh, np.float64)
    peak = np.ascontiguousarray(peak, np.float64)
    flux = np.ascontiguousarray(flux, np.float64).copy()
    order = np.ascontiguousarray(order, np.int64)
    roots = np.empty(L, np.int64)
    lib.dvm_merge(
        L, len(ea), ea, eb, eh, peak, flux, order,
        int(nthr), float(thr), float(cont), roots,
    )
    return roots


def lutz_deblend(val, flat, ea, eb, f, nthr, thr, cont):
    """Native sep-faithful multi-threshold tree deblender
    (runtime/segmerge.cpp dvm_lutz; DetectionConfig.deblend_algo='lutz').

    val/flat: the masked-pixel COO values and flat indices; ea/eb: pixel
    8-neighbor edge pairs (array indices).  Returns the per-pixel object
    labels (int64 flat index of each pixel's object peak), or None when
    the native library is unavailable (the Lutz path has no Python
    fallback — it is an opt-in native feature)."""
    lib = _get_lib()
    if lib is None:
        return None
    val = np.ascontiguousarray(val, np.float64)
    flat = np.ascontiguousarray(flat, np.int64)
    ea = np.ascontiguousarray(ea, np.int64)
    eb = np.ascontiguousarray(eb, np.int64)
    labels = np.empty(len(val), np.int64)
    n = lib.dvm_lutz(
        len(val), len(ea), val, flat, ea, eb,
        int(f), int(nthr), float(thr), float(cont), labels,
    )
    if n < 0:
        return None
    return labels
