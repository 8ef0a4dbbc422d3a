"""ctypes bindings for the native CSV parser (mgr_tpu/native/fastcsv.cpp).

The shared library builds on demand with g++ the first time it's needed
and caches next to the source. Every entry point degrades gracefully to
a NumPy fallback, so the framework works on hosts without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "fastcsv.cpp")
_LIB = os.path.join(_NATIVE_DIR, "libfastcsv.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.fastcsv_load.restype = ctypes.c_int
        lib.fastcsv_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
        ]
        lib.fastcsv_free.restype = None
        lib.fastcsv_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_numeric_csv(
    path: str, skip_header: bool = True
) -> np.ndarray:
    """Numeric CSV -> (rows, cols) float32. Native parse when the shared
    library is available, NumPy fallback otherwise."""
    lib = _load()
    if lib is None:
        return _numpy_fallback(path, skip_header)
    data = ctypes.POINTER(ctypes.c_float)()
    rows = ctypes.c_longlong()
    cols = ctypes.c_longlong()
    rc = lib.fastcsv_load(
        path.encode(), int(skip_header),
        ctypes.byref(data), ctypes.byref(rows), ctypes.byref(cols),
    )
    if rc != 0:
        return _numpy_fallback(path, skip_header)
    try:
        n = rows.value * cols.value
        out = np.ctypeslib.as_array(data, shape=(n,)).copy()
        return out.reshape(rows.value, cols.value)
    finally:
        lib.fastcsv_free(data)


def _numpy_fallback(path: str, skip_header: bool) -> np.ndarray:
    out = np.loadtxt(
        path, delimiter=",", skiprows=1 if skip_header else 0,
        dtype=np.float32, ndmin=2,
    )
    return out
