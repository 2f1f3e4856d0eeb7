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


def _register_io_symbols(lib):
    """ctypes signatures for the async writer + npy loader/stream
    (added lazily so older cached .so builds without them still load
    the geometry/store surface)."""
    c_vp, c_cp = ctypes.c_void_p, ctypes.c_char_p
    lib.dcarl_writer_open.restype = c_vp
    lib.dcarl_writer_open.argtypes = [c_cp]
    lib.dcarl_writer_append.argtypes = [c_vp, c_cp, ctypes.c_int]
    lib.dcarl_writer_flush.argtypes = [c_vp]
    lib.dcarl_writer_lines_written.restype = ctypes.c_int64
    lib.dcarl_writer_lines_written.argtypes = [c_vp]
    lib.dcarl_writer_close.argtypes = [c_vp]

    lib.dcarl_npy_open.restype = c_vp
    lib.dcarl_npy_open.argtypes = [c_cp]
    lib.dcarl_npy_info.restype = ctypes.c_int
    lib.dcarl_npy_info.argtypes = [c_vp, ctypes.POINTER(ctypes.c_int64),
                                   ctypes.POINTER(ctypes.c_int)]
    lib.dcarl_npy_data.restype = c_vp
    lib.dcarl_npy_data.argtypes = [c_vp]
    lib.dcarl_npy_close.argtypes = [c_vp]

    lib.dcarl_stream_open.restype = c_vp
    lib.dcarl_stream_open.argtypes = [c_cp, ctypes.c_int64, ctypes.c_int]
    lib.dcarl_stream_next.restype = ctypes.c_int64
    lib.dcarl_stream_next.argtypes = [c_vp, ctypes.c_void_p, ctypes.c_int64]
    lib.dcarl_stream_row_bytes.restype = ctypes.c_int64
    lib.dcarl_stream_row_bytes.argtypes = [c_vp]
    lib.dcarl_stream_total_rows.restype = ctypes.c_int64
    lib.dcarl_stream_total_rows.argtypes = [c_vp]
    lib.dcarl_stream_close.argtypes = [c_vp]


def _io_lib():
    lib = load_library()
    if lib is None:
        return None
    if not getattr(lib, "_dcarl_io_registered", False):
        try:
            _register_io_symbols(lib)
        except AttributeError:
            # stale cached build without the IO surface — rebuild once
            lib = load_library(rebuild=True)
            if lib is None:
                return None
            _register_io_symbols(lib)
        lib._dcarl_io_registered = True
    return lib


class AsyncLogWriter:
    """Background-thread batched line writer (native).  Drop-in for the
    reference's synchronous ``open(path, 'a').write`` record logging —
    ``append`` never blocks on disk I/O."""

    def __init__(self, path: str):
        self.lib = _io_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.handle = self.lib.dcarl_writer_open(path.encode())
        if not self.handle:
            raise IOError(f"cannot open {path}")

    def append(self, line: str) -> None:
        data = line.encode()
        self.lib.dcarl_writer_append(self.handle, data, len(data))

    def flush(self) -> None:
        self.lib.dcarl_writer_flush(self.handle)

    @property
    def lines_written(self) -> int:
        return int(self.lib.dcarl_writer_lines_written(self.handle))

    def close(self) -> None:
        if self.handle:
            self.lib.dcarl_writer_close(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


_NPY_DTYPES = {1: np.float32, 2: np.float64, 3: np.int32, 4: np.int64,
               5: np.uint8}


def npy_mmap(path: str) -> np.ndarray:
    """Zero-copy view of a .npy file through the native mmap loader
    (copied into an owning array on return so the mapping can close)."""
    lib = _io_lib()
    if lib is None:
        return np.load(path)
    h = lib.dcarl_npy_open(path.encode())
    if not h:
        raise IOError(f"cannot open {path} as npy")
    shape = (ctypes.c_int64 * 8)()
    code = ctypes.c_int()
    ndim = lib.dcarl_npy_info(h, shape, ctypes.byref(code))
    dt = _NPY_DTYPES[code.value]
    shp = tuple(shape[i] for i in range(ndim))
    n = int(np.prod(shp))
    buf = (ctypes.c_char * (n * np.dtype(dt).itemsize)).from_address(
        lib.dcarl_npy_data(h))
    arr = np.frombuffer(buf, dtype=dt).reshape(shp).copy()
    lib.dcarl_npy_close(h)
    return arr


class NpyStream:
    """Chunked row stream over a .npy file with background read-ahead
    (double-buffered) — the native data-loader feeding device transfers
    while the previous chunk computes (SURVEY.md §2.6 data-path item).

    Iterates [chunk_rows, ...] arrays; the final chunk may be short.
    """

    def __init__(self, path: str, chunk_rows: int, n_buffers: int = 2):
        self.lib = _io_lib()
        if self.lib is None:
            raise RuntimeError("native library unavailable")
        self.handle = self.lib.dcarl_stream_open(path.encode(),
                                                 chunk_rows, n_buffers)
        if not self.handle:
            raise IOError(f"cannot stream {path}")
        self.chunk_rows = chunk_rows
        self.row_bytes = int(self.lib.dcarl_stream_row_bytes(self.handle))
        self.total_rows = int(self.lib.dcarl_stream_total_rows(self.handle))
        # row dtype/shape from the header (re-open cheap; header-only)
        h = self.lib.dcarl_npy_open(path.encode())
        shape = (ctypes.c_int64 * 8)()
        code = ctypes.c_int()
        ndim = self.lib.dcarl_npy_info(h, shape, ctypes.byref(code))
        self.dtype = _NPY_DTYPES[code.value]
        self.row_shape = tuple(shape[i] for i in range(1, ndim))
        self.lib.dcarl_npy_close(h)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        buf = np.empty(self.chunk_rows * self.row_bytes, np.uint8)
        rows = self.lib.dcarl_stream_next(
            self.handle, buf.ctypes.data_as(ctypes.c_void_p),
            buf.nbytes)
        if rows < 0:
            raise IOError("stream chunk larger than buffer")
        if rows == 0:
            raise StopIteration
        out = buf[: rows * self.row_bytes].view(self.dtype)
        return out.reshape((rows,) + self.row_shape)

    def close(self) -> None:
        if self.handle:
            self.lib.dcarl_stream_close(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
