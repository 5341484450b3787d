"""ctypes binding: native (C++) batch-prep primitives.

Drop-in replacements for the numpy hot spots in
:mod:`pyhgt_tpu.sampling.sorted_batch` — the host-side builder of the
scatter-free device layout (the reference does the equivalent packing in
``to_torch``, ``/root/reference/pyHGT/data.py:212-256``, but leaves the
heavy per-edge machinery to PyG's CUDA scatters; here the host prepares
permutations + CSR pointers + reduction aux instead).

Every key is a bounded int (flat node id / bank row / RTE-table row), so
the three ``np.argsort`` calls become stable counting sorts (O(E + S),
bit-identical permutations) and each grouping's tiled + Pallas aux builds
in one C++ pass. GIL stays held (calls are sub-ms); the loader's worker
threads already overlap across batches.

All functions raise on native-library build failure — callers gate on
:func:`native_available` and fall back to the numpy path.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        from pyhgt_tpu.native.build import load_library

        _LIB = load_library()
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def counting_sort(key: np.ndarray, num_segments: int
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Stable sort permutation + CSR seg_ptr for int keys in
    ``[0, num_segments]`` (the top value is the padding sentinel).

    Returns ``(perm [E] int32, seg_ptr [num_segments+1] int32)`` —
    bit-identical to ``np.argsort(key, kind='stable')`` +
    ``np.searchsorted(key[perm], np.arange(num_segments+1))``."""
    lib = _lib()
    key = np.ascontiguousarray(key, dtype=np.int32)
    E = key.shape[0]
    perm = np.empty(E, np.int32)
    seg_ptr = np.empty(num_segments + 1, np.int32)
    rc = lib.sb_counting_sort(_i32p(key), E, num_segments, _i32p(perm),
                              _i32p(seg_ptr))
    if rc != 0:
        raise ValueError(f"key out of [0, {num_segments}] range")
    return perm, seg_ptr


def permute_build(src0, tgt0, dt0, mask0, perm, edge_block, gather_off,
                  edge_rel, E_padded: int, *, C: int, L: int, R: int,
                  N: int, B: int):
    """Fused permute + gidx/tabidx/onehot build + PK padding — the numpy
    body of ``sort_edges`` between the target sort and the aux builds,
    in one C++ pass. Returns
    ``(src, tgt_safe, dt, mask, key, gidx, tabidx, onehot)``, all padded
    to ``E_padded``."""
    lib = _lib()
    i32 = lambda a: np.ascontiguousarray(a, dtype=np.int32)
    src0, tgt0, dt0 = i32(src0), i32(tgt0), i32(dt0)
    perm = i32(perm)
    edge_block, gather_off, edge_rel = (
        i32(edge_block), i32(gather_off), i32(edge_rel))
    mask0 = np.ascontiguousarray(mask0, dtype=np.uint8)
    E0 = src0.shape[0]
    E = E_padded
    src = np.empty(E, np.int32)
    tgt_safe = np.empty(E, np.int32)
    dt = np.empty(E, np.int32)
    mask = np.empty(E, np.uint8)
    key = np.empty(E, np.int32)
    gidx = np.empty(E, np.int32)
    tabidx = np.empty(E, np.int32)
    onehot = np.empty((E, R), np.float32)
    u8 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    lib.sb_permute_build(
        _i32p(src0), _i32p(tgt0), _i32p(dt0), u8(mask0), _i32p(perm),
        _i32p(edge_block), _i32p(gather_off), _i32p(edge_rel),
        E0, E, C, L, R, N, B,
        _i32p(src), _i32p(tgt_safe), _i32p(dt), u8(mask), _i32p(key),
        _i32p(gidx), _i32p(tabidx),
        onehot.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return (src, tgt_safe, dt, mask.view(bool), key, gidx, tabidx, onehot)


def tiled_aux(key_sorted: np.ndarray, num_segments: int, K: int):
    """Native :func:`pyhgt_tpu.sampling.sorted_batch._tiled_aux`."""
    lib = _lib()
    key_sorted = np.ascontiguousarray(key_sorted, dtype=np.int32)
    E = key_sorted.shape[0]
    assert E % K == 0, (E, K)
    M = num_segments + E // K
    tl = np.empty(E, np.int32)
    live_idx = np.empty(M, np.int32)
    live_key = np.empty(M, np.int32)
    live_last = np.empty(M, np.int32)
    seg_ptr2 = np.empty(num_segments + 1, np.int32)
    n = lib.sb_tiled_aux(_i32p(key_sorted), E, num_segments, K, _i32p(tl),
                         _i32p(live_idx), _i32p(live_key), _i32p(live_last),
                         _i32p(seg_ptr2))
    if n < 0:
        raise ValueError("live rows exceed the static bound")
    return tl, live_idx, live_key, live_last, seg_ptr2


def tab_window_aux(tab_src_order: np.ndarray, num_blocks: int, L: int,
                   K: int, W: int):
    """Native :func:`pyhgt_tpu.sampling.sorted_batch.pallas_tab_window_aux`.
    Returns None when the window structure doesn't hold (tiny layouts),
    exactly like the numpy reference."""
    from pyhgt_tpu.ops.pallas_seg import PallasSegAux

    lib = _lib()
    assert W >= L, (W, L)
    tab = np.ascontiguousarray(tab_src_order, dtype=np.int32)
    E = tab.shape[0]
    assert E % K == 0, (E, K)
    tiles = E // K
    loc = np.empty((tiles, K), np.int32)
    blk_ext = np.empty(tiles + num_blocks - 1, np.int32)
    rc = lib.sb_tab_window_aux(_i32p(tab), E, num_blocks, L, K, W,
                               _i32p(loc), _i32p(blk_ext))
    if rc != 0:
        return None
    s = np.arange(num_blocks * L + 1)
    ptr2 = ((s // L) * W + s % L).astype(np.int32)
    # straddle bounded by the table length (see the numpy builder)
    return PallasSegAux(loc=loc, blk=blk_ext, ptr2=ptr2, w=W, v=L)


def pallas_aux(key_sorted: np.ndarray, num_segments: int, K: int, W: int):
    """Native :func:`pyhgt_tpu.sampling.sorted_batch.pallas_seg_aux`."""
    from pyhgt_tpu.ops.pallas_seg import PallasSegAux

    lib = _lib()
    key_sorted = np.ascontiguousarray(key_sorted, dtype=np.int32)
    E = key_sorted.shape[0]
    assert E % K == 0 and W >= K, (E, K, W)
    tiles = E // K
    NB = (num_segments + tiles + W - 1) // W + 1
    loc = np.empty((tiles, K), np.int32)
    blk_ext = np.empty(tiles + NB - 1, np.int32)
    ptr2 = np.empty(num_segments + 1, np.int32)
    live_key_ext = np.empty(NB * W, np.int32)
    n = lib.sb_pallas_aux(_i32p(key_sorted), E, num_segments, K, W, NB,
                          _i32p(loc), _i32p(blk_ext), _i32p(ptr2),
                          _i32p(live_key_ext))
    if n < 0:
        raise ValueError("live rows exceed NB*W")
    return PallasSegAux(loc=loc, blk=blk_ext, ptr2=ptr2,
                        live_key=live_key_ext, w=W)
