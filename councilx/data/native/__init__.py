"""ctypes binding for the native C++ image loader (cxloader.cc).

Build-on-first-use: compiles the shared library with g++ into
``~/.cache/councilx/`` (keyed on a source hash) the first time it's needed.
Falls back cleanly — ``load_native()`` returns None when no compiler or
libs are available, and callers keep using the PIL path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "cxloader.cc")
_LIB = None
_TRIED = False


def _build_lib() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get("COUNCILX_CACHE",
                           os.path.expanduser("~/.cache/councilx"))
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"libcxloader-{tag}.so")
    if os.path.exists(so_path):
        return so_path
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", so_path, "-ljpeg", "-lpng", "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return None
    return so_path


def load_native():
    """Return the loaded ctypes library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("COUNCILX_NO_NATIVE"):
        return None
    so_path = _build_lib()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.cxl_open.restype = ctypes.c_void_p
    lib.cxl_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_int, ctypes.c_int]
    lib.cxl_load_batch.restype = ctypes.c_int
    lib.cxl_load_batch.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_long),
                                   ctypes.c_int, ctypes.c_void_p]
    lib.cxl_close.restype = None
    lib.cxl_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


class NativeImageLoader:
    """Decode+resize a fixed set of image paths with the C++ thread pool.

    Mirrors dataset.py::_load_resize_crop semantics (shorter-side triangle-
    filter resize + center crop to new_size square, HWC uint8).
    """

    def __init__(self, paths: Sequence[str], new_size: int,
                 threads: int = 8):
        lib = load_native()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.paths: List[str] = list(paths)
        self.new_size = new_size
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths])
        self._ctx = lib.cxl_open(arr, len(self.paths), new_size, threads)
        if not self._ctx:
            raise RuntimeError("cxl_open failed")

    def load_batch(self, indices: np.ndarray) -> np.ndarray:
        """indices (B,) int64 -> (B, new_size, new_size, 3) uint8.

        Raises on decode failure (corrupt file / unsupported format) so the
        caller can fall back to PIL for those paths."""
        idx = np.ascontiguousarray(indices, dtype=np.int64)
        out = np.empty((len(idx), self.new_size, self.new_size, 3), np.uint8)
        failures = self._lib.cxl_load_batch(
            self._ctx, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(idx), out.ctypes.data_as(ctypes.c_void_p))
        if failures:
            raise IOError(f"native loader failed on {failures} image(s)")
        return out

    def close(self):
        if getattr(self, "_ctx", None):
            self._lib.cxl_close(self._ctx)
            self._ctx = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
