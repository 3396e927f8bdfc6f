"""ctypes binding for the native batch-gather engine (native/gaitloader.cpp).

Auto-builds the shared library on first use if a toolchain is present,
falls back to numpy fancy indexing otherwise — every caller works either
way; the native path is just faster (multithreaded row memcpy that releases
the GIL).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
# PrefetchLoader's producer thread and the main thread can race the first
# call: without the lock both would run `make -B` concurrently and dlopen
# a .so that the other build is rewriting
_LIB_LOCK = threading.Lock()

# sources live INSIDE the package (ugaitnet_tpu/native/) so installed
# copies — not just the repo checkout — can self-build; shipped as
# package-data by pyproject.toml
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgaitloader.so")


_ABI_VERSION = 3          # must match ug_version() in gaitloader.cpp
_CPP_PATH = os.path.join(_NATIVE_DIR, "gaitloader.cpp")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def _needs_rebuild() -> bool:
    if not os.path.exists(_SO_PATH):
        return True
    try:   # stale binary after a source edit
        return os.path.getmtime(_CPP_PATH) > os.path.getmtime(_SO_PATH)
    except OSError:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LIB_LOCK:
        return _get_lib_locked()


def _get_lib_locked() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:   # the thread we waited on resolved it
        return _LIB
    _TRIED = True
    if os.environ.get("UGAITNET_NO_NATIVE"):
        return None
    if _needs_rebuild() and not _build():
        return None

    def load():
        lib = ctypes.CDLL(_SO_PATH)
        lib.ug_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int]
        lib.ug_gather_rows.restype = ctypes.c_int
        lib.ug_version.restype = ctypes.c_int
        return lib

    try:
        lib = load()
        if lib.ug_version() != _ABI_VERSION:
            # committed/stale binary from an older ABI: rebuild once
            if _build():
                lib = load()
            if lib.ug_version() != _ABI_VERSION:
                _LIB = None
                return None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray,
                out: Optional[np.ndarray] = None,
                nthreads: int = 0) -> np.ndarray:
    """out[i] = src[idx[i]] for a C-contiguous (or memory-mapped) 2D+ array.

    Uses the native thread pool when available, numpy otherwise.
    """
    idx = np.ascontiguousarray(np.asarray(idx, dtype=np.int64))
    n = len(idx)
    row_shape = src.shape[1:]
    if n and idx.min() < 0:
        # negative indices would wrap in np.take but OOB-check in the
        # native path — refuse them in BOTH so results never depend on
        # which path a host happens to use
        raise IndexError(f"negative gather index {idx.min()}")
    if out is None:
        out = np.empty((n, *row_shape), dtype=src.dtype)
    elif out.shape != (n, *row_shape) or out.dtype != src.dtype:
        # the native path memcpys n*row_bytes blindly into out's buffer —
        # a too-small/mistyped out would be a heap overrun, not an error
        raise ValueError(
            f"out has shape {out.shape} dtype {out.dtype}; need "
            f"{(n, *row_shape)} {src.dtype}")
    lib = get_lib()
    row_bytes = int(np.prod(row_shape)) * src.dtype.itemsize
    # memmaps expose their buffer; plain arrays must be C-contiguous —
    # and so must a caller-supplied out (the memcpy assumes dense rows)
    c_ok = (getattr(src, "flags", None) is not None
            and src.flags["C_CONTIGUOUS"] and out.flags["C_CONTIGUOUS"])
    if lib is None or not c_ok:
        np.take(src, idx, axis=0, out=out)
        return out
    src_ptr = src.ctypes.data_as(ctypes.c_void_p)
    out_ptr = out.ctypes.data_as(ctypes.c_void_p)
    rc = lib.ug_gather_rows(
        src_ptr, int(src.shape[0]), row_bytes,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, out_ptr, nthreads)
    if rc != 0:
        # match the numpy fallback's behavior instead of an OOB memcpy
        raise IndexError(
            f"gather index out of range [0, {src.shape[0]}) "
            f"(min {idx.min()}, max {idx.max()})")
    return out
