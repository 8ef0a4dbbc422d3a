"""ctypes bindings for the native CSV parser (mgr_tpu/native/fastcsv.cpp).

The shared library builds on demand with g++ the first time it's needed
and caches under ``$MGR_TPU_CACHE`` (default ``~/.cache/mgr_tpu``),
keyed by a hash of the source so edits rebuild automatically. No
prebuilt binary ships in the tree. Every entry point degrades
gracefully to a NumPy fallback, so the framework works on hosts
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "fastcsv.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _lib_path() -> str:
    cache = os.environ.get(
        "MGR_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mgr_tpu"),
    )
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:12]
    return os.path.join(cache, f"libfastcsv-{tag}.so")


def _build(lib_path: str) -> bool:
    try:
        os.makedirs(os.path.dirname(lib_path), exist_ok=True)
        tmp = lib_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, lib_path)  # atomic vs concurrent builders
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        lib_path = _lib_path()
        if not os.path.exists(lib_path) and not _build(lib_path):
            return None
        try:
            lib = ctypes.CDLL(lib_path)
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
