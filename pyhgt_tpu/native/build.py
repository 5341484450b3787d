"""Lazy g++ build + ctypes load of the native sampler library."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None

_SRC = os.path.join(os.path.dirname(__file__), "hgsampler.cpp")


def _cache_path() -> str:
    with open(_SRC, "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "PYHGT_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pyhgt_tpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"_hgsampler_{h}.so")


def build_library(force: bool = False) -> str:
    """Compile hgsampler.cpp to a shared library (content-hashed cache)."""
    out = _cache_path()
    if force or not os.path.exists(out):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", out + ".tmp", _SRC,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(out + ".tmp", out)
    return out


def load_library() -> ctypes.CDLL:
    """Build if needed and load; declares argtypes for the C ABI."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        lib = ctypes.CDLL(build_library())
        c = ctypes
        lib.hgs_graph_create.restype = c.c_void_p
        lib.hgs_graph_create.argtypes = [
            c.c_int, c.c_int,
            c.POINTER(c.c_int), c.POINTER(c.c_int),
            c.POINTER(c.POINTER(c.c_int64)), c.POINTER(c.c_int64),
            c.POINTER(c.POINTER(c.c_int32)), c.POINTER(c.POINTER(c.c_int32)),
        ]
        lib.hgs_graph_destroy.restype = None
        lib.hgs_graph_destroy.argtypes = [c.c_void_p]
        lib.hgs_sample.restype = c.c_int
        lib.hgs_sample.argtypes = [
            c.c_void_p, c.c_uint64,
            c.c_int, c.c_int,
            c.c_int64, c.c_int,
            c.POINTER(c.c_int), c.POINTER(c.c_int64), c.POINTER(c.c_int32),
            c.c_int64,
            c.c_int64, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
            c.POINTER(c.c_int64),
            c.c_int64, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
            c.POINTER(c.c_int64),
        ]
        _LIB = lib
        return lib
