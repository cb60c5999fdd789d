"""ctypes wrapper for the native data loader (runtime/dataloader.cpp).

The native side mmaps .npy archives, shuffles per epoch, converts
float64 -> float32, and prefetches assembled batches on a background thread,
so the host never stalls the TPU step loop (the reference's equivalent is
Keras's in-process numpy slicing, training/train.py:27-37).

``NativeNpyLoader`` compiles the shared library on first use (g++ is part of
the toolchain); if compilation is impossible the pure-numpy ``NumpyLoader``
fallback provides the same iterator contract.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["NativeNpyLoader", "NumpyLoader", "make_loader", "native_available"]

_RUNTIME_DIR = Path(__file__).resolve().parent
_SO_PATH = _RUNTIME_DIR / "libdvloader.so"
_SRC_PATH = _RUNTIME_DIR / "dataloader.cpp"

_lib = None
_lib_error: str | None = None


def _build_library() -> Path:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
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
        lib.dvl_open.restype = ctypes.c_void_p
        lib.dvl_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_uint64,
        ]
        lib.dvl_last_error.restype = ctypes.c_char_p
        for fn in (
            "dvl_rows",
            "dvl_x_row_elems",
            "dvl_y_row_elems",
            "dvl_ndim_x",
            "dvl_ndim_y",
        ):
            getattr(lib, fn).restype = ctypes.c_int64
            getattr(lib, fn).argtypes = [ctypes.c_void_p]
        for fn in ("dvl_shape_x", "dvl_shape_y"):
            getattr(lib, fn).argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int64),
            ]
        lib.dvl_next.restype = ctypes.c_int
        lib.dvl_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.dvl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    except (subprocess.CalledProcessError, OSError) as e:
        _lib_error = str(e)
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeNpyLoader:
    """Prefetching batch iterator over (inputs.npy, labels.npy)."""

    def __init__(
        self,
        x_path: str | Path,
        y_path: str | Path,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
    ):
        lib = _get_lib()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_lib_error}")
        self._lib = lib
        self._handle = lib.dvl_open(
            str(x_path).encode(), str(y_path).encode(), batch_size, int(shuffle), seed
        )
        if not self._handle:
            raise RuntimeError(
                f"loader open failed: {lib.dvl_last_error().decode()}"
            )
        self.batch_size = batch_size
        self.rows = lib.dvl_rows(self._handle)

        def _shape(ndim_fn, shape_fn):
            ndim = ndim_fn(self._handle)
            buf = (ctypes.c_int64 * ndim)()
            shape_fn(self._handle, buf)
            return tuple(int(s) for s in buf)

        self.x_shape = _shape(lib.dvl_ndim_x, lib.dvl_shape_x)
        self.y_shape = _shape(lib.dvl_ndim_y, lib.dvl_shape_y)
        self._xe = lib.dvl_x_row_elems(self._handle)
        self._ye = lib.dvl_y_row_elems(self._handle)

    def __len__(self) -> int:
        return int(self.rows // self.batch_size)

    def next_batch(self) -> tuple[np.ndarray, np.ndarray]:
        x = np.empty((self.batch_size, self._xe), np.float32)
        y = np.empty((self.batch_size, self._ye), np.float32)
        n = self._lib.dvl_next(
            self._handle,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n < 0:
            raise StopIteration
        return (
            x.reshape((self.batch_size,) + self.x_shape[1:]),
            y.reshape((self.batch_size,) + self.y_shape[1:]),
        )

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self) -> None:
        if self._handle:
            self._lib.dvl_close(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NumpyLoader:
    """Pure-numpy fallback with the same contract."""

    def __init__(self, x, y, batch_size, shuffle=True, seed=0):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._order = np.arange(len(self.x))
        self._cursor = len(self.x)  # trigger reshuffle on first call
        self.x_shape = self.x.shape

    def __len__(self):
        return len(self.x) // self.batch_size

    def next_batch(self):
        if self._cursor + self.batch_size > len(self.x):
            if self.shuffle:
                self._rng.shuffle(self._order)
            self._cursor = 0
        idx = self._order[self._cursor : self._cursor + self.batch_size]
        self._cursor += self.batch_size
        return (
            self.x[idx].astype(np.float32),
            self.y[idx].astype(np.float32),
        )

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        pass


def make_loader(x, y, batch_size, shuffle=True, seed=0):
    """Native loader for on-disk .npy paths, numpy fallback for arrays."""
    if isinstance(x, (str, Path)) and native_available():
        return NativeNpyLoader(x, y, batch_size, shuffle, seed)
    if isinstance(x, (str, Path)):
        return NumpyLoader(np.load(x), np.load(y), batch_size, shuffle, seed)
    return NumpyLoader(x, y, batch_size, shuffle, seed)
