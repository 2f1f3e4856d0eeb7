"""ctypes bindings for the C++ host runtime (csrc/dcarl_host.cpp).

Auto-builds ``libdcarl_host.so`` on first use (g++ is baked into the
image) and exposes: native polyline geometry, the grid-hashed box store
(host-side R-tree replacement for dataset tooling and single queries),
and the binary append log.  Everything has a pure-numpy fallback, so
the library is optional at runtime.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libdcarl_host.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library(rebuild: bool = False) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if not os.path.exists(_LIB_PATH) or rebuild:
        if not _build():
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    c_dp = ctypes.POINTER(ctypes.c_double)

    lib.dcarl_wrap_angle.restype = ctypes.c_double
    lib.dcarl_wrap_angle.argtypes = [ctypes.c_double]

    lib.dcarl_dense_polyline2d.restype = ctypes.c_int
    lib.dcarl_dense_polyline2d.argtypes = [
        c_dp, ctypes.c_int, ctypes.c_double, c_dp, ctypes.c_int]

    lib.dcarl_project_point_to_polyline.restype = None
    lib.dcarl_project_point_to_polyline.argtypes = [
        ctypes.c_double, ctypes.c_double, c_dp, ctypes.c_int, c_dp]

    lib.dcarl_boxstore_new.restype = ctypes.c_void_p
    lib.dcarl_boxstore_new.argtypes = [ctypes.c_int, c_dp]
    lib.dcarl_boxstore_free.argtypes = [ctypes.c_void_p]
    lib.dcarl_boxstore_insert.restype = ctypes.c_int
    lib.dcarl_boxstore_insert.argtypes = [
        ctypes.c_void_p, c_dp, ctypes.c_double, ctypes.c_double]
    lib.dcarl_boxstore_size.restype = ctypes.c_int
    lib.dcarl_boxstore_size.argtypes = [ctypes.c_void_p]
    lib.dcarl_boxstore_query.argtypes = [ctypes.c_void_p, c_dp, c_dp]
    lib.dcarl_boxstore_query_bruteforce.argtypes = [
        ctypes.c_void_p, c_dp, c_dp]
    lib.dcarl_boxstore_save.restype = ctypes.c_int
    lib.dcarl_boxstore_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.dcarl_boxstore_load.restype = ctypes.c_void_p
    lib.dcarl_boxstore_load.argtypes = [ctypes.c_char_p]

    lib.dcarl_log_open.restype = ctypes.c_void_p
    lib.dcarl_log_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.dcarl_log_append.argtypes = [ctypes.c_void_p, c_dp, ctypes.c_int]
    lib.dcarl_log_flush.argtypes = [ctypes.c_void_p]
    lib.dcarl_log_close.argtypes = [ctypes.c_void_p]
    lib.dcarl_log_read.restype = ctypes.c_int64
    lib.dcarl_log_read.argtypes = [ctypes.c_char_p, ctypes.c_int, c_dp,
                                   ctypes.c_int64]
    _lib = lib
    return _lib


def _dp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def dense_polyline2d(line: np.ndarray, resolution: float) -> np.ndarray:
    lib = load_library()
    line = np.ascontiguousarray(line, dtype=np.float64)
    if lib is None:
        from dcarl_tpu.ops.geometry import dense_polyline2d_np

        return dense_polyline2d_np(line, resolution)
    max_out = int(1e7 // 16)
    out = np.empty((max_out, 2), dtype=np.float64)
    n = lib.dcarl_dense_polyline2d(_dp(line), len(line), resolution,
                                   _dp(out), max_out)
    return out[:n].copy()


def project_point_to_polyline(x: float, y: float, line: np.ndarray
                              ) -> Tuple[float, int, int, float, float]:
    lib = load_library()
    line = np.ascontiguousarray(line, dtype=np.float64)
    if lib is None:
        from dcarl_tpu.ops.geometry import project_point_to_polyline_np

        return project_point_to_polyline_np(x, y, line)
    res = np.empty(5, dtype=np.float64)
    lib.dcarl_project_point_to_polyline(x, y, _dp(line), len(line), _dp(res))
    return float(res[0]), int(res[1]), int(res[2]), float(res[3]), float(res[4])


class HostBoxStore:
    """Host-side spatial value store with R-tree query semantics
    (grid-hash index; exact containment check)."""

    def __init__(self, half_widths: np.ndarray, _handle=None):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native library unavailable (g++/make failed)")
        self.widths = np.ascontiguousarray(half_widths, dtype=np.float64)
        self.dim = len(self.widths)
        self.handle = _handle if _handle is not None else \
            self.lib.dcarl_boxstore_new(self.dim, _dp(self.widths))

    def insert(self, key: np.ndarray, action: float, value: float) -> int:
        key = np.ascontiguousarray(key, dtype=np.float64)
        return self.lib.dcarl_boxstore_insert(self.handle, _dp(key),
                                              float(action), float(value))

    def query(self, q: np.ndarray, exact: bool = False
              ) -> Tuple[int, float, float]:
        q = np.ascontiguousarray(q, dtype=np.float64)
        out = np.empty(3, dtype=np.float64)
        if exact:
            self.lib.dcarl_boxstore_query_bruteforce(self.handle, _dp(q),
                                                     _dp(out))
        else:
            self.lib.dcarl_boxstore_query(self.handle, _dp(q), _dp(out))
        return int(out[0]), float(out[1]), float(out[2])

    def __len__(self) -> int:
        return self.lib.dcarl_boxstore_size(self.handle)

    def save(self, path: str) -> None:
        if self.lib.dcarl_boxstore_save(self.handle, path.encode()) != 0:
            raise IOError(f"cannot save box store to {path}")

    @classmethod
    def load(cls, path: str) -> "HostBoxStore":
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        handle = lib.dcarl_boxstore_load(path.encode())
        if not handle:
            raise IOError(f"cannot load box store from {path}")
        # recover widths from a probe: stored in the file header; simplest
        # is to re-read via numpy for the wrapper's metadata
        with open(path, "rb") as f:
            import struct

            dim, _n = struct.unpack("ii", f.read(8))
            widths = np.frombuffer(f.read(8 * dim), dtype=np.float64)
        return cls(widths, _handle=handle)

    def __del__(self):
        if getattr(self, "lib", None) is not None and \
                getattr(self, "handle", None):
            self.lib.dcarl_boxstore_free(self.handle)


class RecordLog:
    """Append-only binary record log (double[width] rows)."""

    def __init__(self, path: str, width: int):
        self.lib = load_library()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.path = path
        self.width = width
        self.handle = self.lib.dcarl_log_open(path.encode(), width)
        if not self.handle:
            raise IOError(f"cannot open {path}")

    def append(self, records: np.ndarray) -> None:
        records = np.ascontiguousarray(records, dtype=np.float64)
        if records.ndim == 1:
            records = records[None]
        assert records.shape[1] == self.width
        self.lib.dcarl_log_append(self.handle, _dp(records), len(records))

    def flush(self) -> None:
        self.lib.dcarl_log_flush(self.handle)

    def close(self) -> None:
        if self.handle:
            self.lib.dcarl_log_close(self.handle)
            self.handle = None

    @staticmethod
    def read(path: str, width: int, max_records: int = 1 << 22) -> np.ndarray:
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        out = np.empty((max_records, width), dtype=np.float64)
        n = lib.dcarl_log_read(path.encode(), width, _dp(out), max_records)
        if n < 0:
            raise IOError(f"cannot read {path}")
        return out[:n].copy()
