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

_DIR = os.path.dirname(__file__)
_SRCS = (
    os.path.join(_DIR, "hgsampler.cpp"),
    os.path.join(_DIR, "sortbatch.cpp"),
)


def _cache_path() -> str:
    h = hashlib.sha256()
    for src in _SRCS:
        with open(src, "rb") as f:
            h.update(f.read())
    cache = os.environ.get(
        "PYHGT_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "pyhgt_tpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"_pyhgt_native_{h.hexdigest()[:16]}.so")


def build_library(force: bool = False) -> str:
    """Compile the native sources (sampler + batch prep) to one shared
    library (content-hashed cache)."""
    out = _cache_path()
    if force or not os.path.exists(out):
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
            "-o", out + ".tmp", *_SRCS,
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
        i32p = c.POINTER(c.c_int32)
        lib.sb_counting_sort.restype = c.c_int
        lib.sb_counting_sort.argtypes = [
            i32p, c.c_int64, c.c_int32, i32p, i32p,
        ]
        lib.sb_tiled_aux.restype = c.c_int64
        lib.sb_tiled_aux.argtypes = [
            i32p, c.c_int64, c.c_int32, c.c_int32,
            i32p, i32p, i32p, i32p, i32p,
        ]
        lib.sb_pallas_aux.restype = c.c_int64
        lib.sb_pallas_aux.argtypes = [
            i32p, c.c_int64, c.c_int32, c.c_int32, c.c_int32, c.c_int64,
            i32p, i32p, i32p, i32p,
        ]
        lib.sb_tab_window_aux.restype = c.c_int
        lib.sb_tab_window_aux.argtypes = [
            i32p, c.c_int64, c.c_int32, c.c_int32, c.c_int32, c.c_int32,
            i32p, i32p,
        ]
        u8p = c.POINTER(c.c_uint8)
        lib.sb_permute_build.restype = c.c_int
        lib.sb_permute_build.argtypes = [
            i32p, i32p, i32p, u8p, i32p, i32p, i32p, i32p,
            c.c_int64, c.c_int64, c.c_int32, c.c_int32, c.c_int32,
            c.c_int32, c.c_int32,
            i32p, i32p, i32p, u8p, i32p, i32p, i32p,
            c.POINTER(c.c_float),
        ]
        _LIB = lib
        return lib
