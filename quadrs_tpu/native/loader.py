"""ctypes binding for the native capture loader (loader.cc).

Builds the shared library on first use (cached next to the source,
rebuilt when the source is newer) and falls back to pure numpy when no
compiler is available — behavior is identical either way, the native
path is faster and overlaps disk I/O with device compute via its
background prefetcher.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from quadrs_tpu.formats import FileFormat

_HERE = Path(__file__).parent
_SRC = _HERE / "loader.cc"
_LIB = _HERE / "_libquadrs_loader.so"

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.qt_open.restype = ctypes.c_void_p
        lib.qt_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.qt_samples.restype = ctypes.c_int64
        lib.qt_samples.argtypes = [ctypes.c_void_p]
        lib.qt_read_planes.restype = ctypes.c_int64
        lib.qt_read_planes.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.qt_close.argtypes = [ctypes.c_void_p]
        lib.qt_prefetch_start.restype = ctypes.c_void_p
        lib.qt_prefetch_start.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.qt_prefetch_next.restype = ctypes.c_int64
        lib.qt_prefetch_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        lib.qt_prefetch_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


class NativeCapture:
    """A capture file opened through the native loader."""

    def __init__(self, path: str | Path, fmt: FileFormat):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader unavailable (no compiler?)")
        self._lib = lib
        self.fmt = fmt
        self._h = lib.qt_open(str(path).encode(), fmt.type_bytes)
        if not self._h:
            raise OSError(f"cannot open {path}")
        self.length = int(lib.qt_samples(self._h))

    def read_planes(self, off: int, n: int) -> np.ndarray:
        """(2, n) native-dtype planes for samples [off, off+n), zero-padded
        past EOF; the count actually read is min(n, length-off)."""
        out = np.zeros((2, n), dtype=self.fmt.raw_dtype)
        got = self._lib.qt_read_planes(
            self._h,
            off,
            n,
            out[0].ctypes.data_as(ctypes.c_void_p),
            out[1].ctypes.data_as(ctypes.c_void_p),
        )
        if got < 0:
            raise OSError(f"read failed at {off}")
        return out

    def prefetch(
        self,
        chunk_samples: int,
        n_buffers: int = 4,
        start_off: int = 0,
        overlap: int = 0,
        n_workers: int = 2,
    ):
        """Iterate (offset, (2, n) planes) chunks with background readahead.

        ``n_workers`` reader threads pread + deinterleave in parallel,
        delivered in stream order.  With ``overlap``, each chunk also
        carries the next ``overlap`` samples of the stream (re-read from
        the following chunk's head) — consumers needing filter lookahead
        get it with zero host-side stitching.  Offsets still advance by
        ``chunk_samples``.
        """
        ph = self._lib.qt_prefetch_start(
            self._h, chunk_samples, n_buffers, start_off, overlap, n_workers
        )
        try:
            while True:
                out = np.empty((2, chunk_samples + overlap), dtype=self.fmt.raw_dtype)
                off = ctypes.c_int64()
                got = self._lib.qt_prefetch_next(
                    ph,
                    ctypes.byref(off),
                    out[0].ctypes.data_as(ctypes.c_void_p),
                    out[1].ctypes.data_as(ctypes.c_void_p),
                )
                if got <= 0:
                    return
                yield int(off.value), out[:, :got]
        finally:
            self._lib.qt_prefetch_stop(ph)

    def close(self):
        if self._h:
            self._lib.qt_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
