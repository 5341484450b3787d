"""Scatter-free HGT edge stage over target-sorted edges (custom VJP).

Motivation (measured on v5e): XLA:TPU lowers ``segment_sum``/`scatter-add`
with duplicate indices to a serialized update loop — ~50 ns/edge, which
made the jnp path ~23 ms/layer on a 226k-edge batch. This module removes
every scatter from both forward AND backward:

- per-segment reductions use a **hierarchical tiled scheme**
  (:func:`seg_sum_tiled`): per-128-edge tile, a one-hot [K,K] MXU matmul
  produces per-(tile, local-rank) partials; the ≤ S+E/128 live partial
  rows (segment-ordered by construction, host aux from
  :func:`pyhgt_tpu.sampling.sorted_batch.sort_batch`) finish with a
  small cumsum-diff. Prefix sums themselves are lower-triangular MXU
  matmuls (:func:`fast_cumsum`);
- the per-segment max for softmax stability is a shift-based segmented
  scan, 7 in-tile steps + a tiny second level (:func:`seg_max_tiled`);
- gather *transposes* in the backward (normally scatter-adds) become
  sorted segment sums under the host-precomputed secondary permutations
  ``perm_src`` / ``perm_tab`` — the CSC view of the same edges;
- the relation-prior gather is an ``[E, R] @ [R, H]`` one-hot matmul, so
  its gradient is the transposed matmul (MXU, no scatter).

The algebra matches :func:`pyhgt_tpu.ops.hgt.hgt_conv_core` exactly
(reference semantics: ``/root/reference/pyHGT/conv.py:60-111``); parity is
asserted in tests/test_sorted_ops.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30


# ---------------------------------------------------------------- primitives
_TILE = 128  # MXU-sized cumsum tile


def fast_cumsum(data):
    """Inclusive cumsum along axis 0 via lower-triangular MXU matmuls.

    XLA's native cumsum costs ~12 ms on [226k, 512] f32 (many elementwise
    passes); this blocked form does one [K,K]x[K,D] matmul per K=128 tile
    (~30 GFLOP total at bench scale — sub-ms on the MXU) plus a carry
    cumsum over the E/K tile totals (recursed while long).
    """
    E = data.shape[0]
    K = _TILE
    pad = (-E) % K
    x = data.astype(jnp.float32)
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
        )
    Et = x.shape[0] // K
    xt = x.reshape((Et, K) + x.shape[1:])
    tri = jnp.tril(jnp.ones((K, K), jnp.float32))
    within = jnp.einsum(
        "km,tm...->tk...", tri, xt, preferred_element_type=jnp.float32
    )
    tile_tot = xt.sum(axis=1)                      # [Et, ...]
    if Et > 2048:
        carry_inc = fast_cumsum(tile_tot)
    else:
        carry_inc = jnp.cumsum(tile_tot, axis=0)
    carry = carry_inc - tile_tot                   # exclusive tile prefix
    out = (within + carry[:, None]).reshape((Et * K,) + x.shape[1:])
    return out[:E]


def seg_sum_csr(data, seg_ptr):
    """Per-segment sums of tgt-sorted ``data [E, ...]`` via cumsum-diff.

    ``seg_ptr [S+1]`` delimits segments (CSR). Returns [S, ...]. f32 cumsum
    error is ~eps·sqrt(E)·|x| — fine for training-grade sums.
    """
    cs = fast_cumsum(data)
    zero = jnp.zeros((1,) + data.shape[1:], dtype=cs.dtype)
    cs = jnp.concatenate([zero, cs], axis=0)      # cs[i] = sum of data[:i]
    return cs[seg_ptr[1:]] - cs[seg_ptr[:-1]]


def seg_max_scan(data, seg_ids):
    """Segmented running max over sorted ``seg_ids``: Hillis–Steele with
    contiguous shifts (log2(E) unrolled steps; ``lax.associative_scan``'s
    odd/even recursion lowers to strided gathers and ran ~10x slower).

    Returns the running tensor [E, ...] (segment max at each segment's
    last row)."""
    E = data.shape[0]
    x = data.astype(jnp.float32)
    ids = seg_ids.astype(jnp.int32)
    tail = (1,) * (data.ndim - 1)
    s = 1
    while s < E:
        pad_x = jnp.full((s,) + x.shape[1:], NEG, x.dtype)
        shifted_x = jnp.concatenate([pad_x, x[:-s]], axis=0)
        shifted_id = jnp.concatenate(
            [jnp.full((s,), -1, ids.dtype), ids[:-s]], axis=0
        )
        same = (shifted_id == ids).reshape((E,) + tail)
        x = jnp.where(same, jnp.maximum(x, shifted_x), x)
        s *= 2
    return x


def seg_max_csr(data, seg_ids, seg_ptr):
    """Per-segment max [S, ...] for tgt-sorted data (empty segments: NEG)."""
    run = seg_max_scan(data, seg_ids)
    S = seg_ptr.shape[0] - 1
    last = jnp.maximum(seg_ptr[1:] - 1, 0)
    out = run[last]
    empty = seg_ptr[1:] == seg_ptr[:-1]
    return jnp.where(empty.reshape((S,) + (1,) * (data.ndim - 1)), NEG, out)


def seg_sum_tiled(data, tile_local, live_idx, seg_ptr2, K=_TILE):
    """Hierarchical tiled segment sum — the MXU-native scatter replacement.

    Level 1: within each K-edge tile, sum rows sharing a local segment
    rank via a one-hot [K, K] matmul (per-tile batched on the MXU).
    Level 2: gather the ≤ S+E/K live (tile, rank) partial rows — already
    in segment order — and finish with a small cumsum-diff. ~5x cheaper
    than a full-length cumsum at bench scale and scatter-free throughout.
    """
    E = data.shape[0]
    tiles = E // K
    x = data.astype(jnp.float32).reshape((tiles, K) + data.shape[1:])
    oh = (
        tile_local.reshape(tiles, K)[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    ).astype(jnp.float32)
    partial = jnp.einsum(
        "tkr,tk...->tr...", oh, x, preferred_element_type=jnp.float32
    ).reshape((tiles * K,) + data.shape[1:])
    flat = jnp.concatenate(
        [partial, jnp.zeros((1,) + data.shape[1:], partial.dtype)], axis=0
    )
    live = flat[live_idx]                     # [M, ...] segment-ordered
    return seg_sum_csr(live, seg_ptr2)


def seg_max_tiled(data, seg_ids, live_last, live_key, seg_ptr2, K=_TILE):
    """Hierarchical tiled segment max: 7 in-tile shift steps, then a tiny
    second-level segmented max over the live rows."""
    E = data.shape[0]
    tiles = E // K
    x = data.astype(jnp.float32).reshape((tiles, K) + data.shape[1:])
    ids = seg_ids.astype(jnp.int32).reshape(tiles, K)
    tail = (1,) * (data.ndim - 1)
    s = 1
    while s < K:
        pad_x = jnp.full((tiles, s) + x.shape[2:], NEG, x.dtype)
        sx = jnp.concatenate([pad_x, x[:, :-s]], axis=1)
        sid = jnp.concatenate(
            [jnp.full((tiles, s), -1, ids.dtype), ids[:, :-s]], axis=1
        )
        same = (sid == ids).reshape((tiles, K) + tail)
        x = jnp.where(same, jnp.maximum(x, sx), x)
        s *= 2
    run = x.reshape((E,) + data.shape[1:])
    run = jnp.concatenate(
        [run, jnp.full((1,) + data.shape[1:], NEG, run.dtype)], axis=0
    )
    live = run[live_last]                     # [M, ...] per-live-row max
    return seg_max_csr(live, live_key, seg_ptr2)


def ring_allreduce(x, axis: str, op: str = "sum"):
    """Manual ring allreduce: reduce-scatter then all-gather, one
    1/P-sized chunk per ``ppermute`` hop — the form real ICI can overlap
    with neighbouring compute. Parity-tested vs psum/pmax on the virtual
    mesh (tests/test_edge_partition.py); see docs/PERF_NOTES.md round-3.
    """
    P = jax.lax.axis_size(axis)
    if P == 1:
        return x
    n0 = x.shape[0]
    pad = (-n0) % P
    if pad:
        fill = NEG if op == "max" else 0.0
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0
        )
    n = x.shape[0]
    c = n // P
    idx = jax.lax.axis_index(axis)
    perm = [(p, (p + 1) % P) for p in range(P)]
    combine = jnp.maximum if op == "max" else jnp.add

    def chunk(buf, j):
        return jax.lax.dynamic_slice_in_dim(buf, j * c, c, axis=0)

    def put(buf, val, j):
        return jax.lax.dynamic_update_slice_in_dim(buf, val, j * c, axis=0)

    buf = x
    send = chunk(buf, idx % P)
    for st in range(P - 1):
        recv = jax.lax.ppermute(send, axis, perm)
        j = (idx - st - 1) % P
        send = combine(chunk(buf, j), recv)
        buf = put(buf, send, j)
    g = send
    for st in range(P - 1):
        g = jax.lax.ppermute(g, axis, perm)
        j = (idx - st) % P
        buf = put(buf, g, j)
    return buf[:n0]


def _xreduce(x, xr, op: str):
    """Cross-shard combine for the partitioned edge stage. ``xr`` is
    ``None`` (single-shard: identity) or ``(axis_name, overlap)``."""
    if xr is None:
        return x
    axis, overlap = xr
    if overlap:
        return ring_allreduce(x, axis, op)
    return jax.lax.pmax(x, axis) if op == "max" else jax.lax.psum(x, axis)


_GROUPING_AUX = {
    "tgt": ("tl_tgt", "live_idx_tgt", "seg_ptr2_tgt", "pseg_tgt"),
    "src": ("tl_src", "live_idx_src", "seg_ptr2_src", "pseg_src"),
    "tab": ("tl_tab", "live_idx_tab", "seg_ptr2_tab", "pseg_tab"),
}


def _pallas_ok(data, paux, use_pallas: bool) -> bool:
    # narrow ([E, H]) and n-D data stay on the XLA tiled path where the
    # kernel's lane padding would waste the win (probe7: narrow kernel
    # marginal 1.45 ms vs 0.6 ms XLA)
    return (
        use_pallas
        and paux is not None
        and data.ndim == 2
        and data.shape[1] >= 128
    )


def _seg_sum_grouped(data, se, grouping: str, use_pallas: bool):
    """Per-segment sum of ``data`` (already in ``grouping``'s edge order).

    ``use_pallas`` routes wide 2-D tensors through the Pallas live-partials
    kernel (ops/pallas_seg.py) when the batch carries its aux.
    """
    tl_n, li_n, sp2_n, paux_n = _GROUPING_AUX[grouping]
    paux = getattr(se, paux_n, None)
    if _pallas_ok(data, paux, use_pallas):
        from pyhgt_tpu.ops.pallas_seg import live_partials

        live = live_partials(data, paux)
        return seg_sum_csr(live, paux.ptr2)
    return seg_sum_tiled(
        data, getattr(se, tl_n), getattr(se, li_n), getattr(se, sp2_n)
    )


# Routes _seg_sum_weighted through the fused weighted kernel
# (live_partials_weighted). Both operands of each use are already
# HBM-resident (w/coef narrow residuals, v_e/k_e save_kv residuals), so
# by the kernel-fusion rule (docs/PERF_NOTES.md round-2) it should win
# ~2 wide materializations per use — but the chip tunnel was down when it
# landed, so it ships OFF until measured (CPU value/grad parity is green
# either way; flip after a bench A/B).
WEIGHTED_KERNEL = False


def _seg_sum_weighted(wgt, val, H, dk, se, grouping: str, use_pallas: bool,
                      out_dtype):
    """Segment sum of ``head_expand(wgt) ⊙ val`` over one grouping.

    On the fused Pallas path the per-edge product is formed tile-by-tile
    in VMEM (:func:`pyhgt_tpu.ops.pallas_seg.live_partials_weighted`) —
    the [E, D] weighted-message tensor never hits HBM. Fallback matches
    the unfused algebra exactly (head-expand matmul + product + the
    standard grouped reduction)."""
    tl_n, li_n, sp2_n, paux_n = _GROUPING_AUX[grouping]
    paux = getattr(se, paux_n, None)
    if WEIGHTED_KERNEL and _pallas_ok(val, paux, use_pallas):
        from pyhgt_tpu.ops.pallas_seg import live_partials_weighted

        live = live_partials_weighted(wgt, val, dk, paux)
        return seg_sum_csr(live, paux.ptr2)
    if out_dtype == jnp.bfloat16:
        # bf16-native product: no f32 [E, D] intermediates (see
        # _head_expand_like); val (v_e / k_e) is already bf16 here
        msg = _head_expand_like(wgt, H, dk, out_dtype) * val.astype(
            out_dtype
        )
    else:
        msg = (
            _head_expand(wgt, H, dk) * val.astype(jnp.float32)
        ).astype(out_dtype)
    return _seg_sum_grouped(msg, se, grouping, use_pallas)


def _seg_sum_grouped_pair(d1, d2, se, grouping: str, use_pallas: bool):
    """Segment sums of TWO same-shape tensors in the same grouping order.

    Routes through :func:`pyhgt_tpu.ops.pallas_seg.live_partials_pair`
    (one grid pass, shared one-hot — the backward's g_k/g_v pairs) when
    eligible; otherwise two independent reductions.

    The SRC grouping additionally supports the singleton-split aux
    (``src_rank_cap``): degree-1 segments — whose "sum" is one row copy —
    bypass the kernel through a pure gather, which bounds the remaining
    multi-segment ranks and lets the kernel one-hot narrow from K+W to
    2V (bench: 768 -> 128; docs/PERF_NOTES.md round-3)."""
    tl_n, li_n, sp2_n, paux_n = _GROUPING_AUX[grouping]
    lo = getattr(se, "pseg_src_lo", None) if grouping == "src" else None
    if (lo is not None and _pallas_ok(d1, lo, use_pallas)
            and d1.shape == d2.shape):
        # two-region src reduction (round-4): region 1 (the meta blocks,
        # a static contiguous slice) through the rank-capped kernel —
        # one-hot W+V = 2*cap wide instead of K+W; region 2 (the self
        # blocks: one edge per node, /root/reference/pyHGT/data.py:
        # 241-243) is singleton-dominated, so a plain cumsum-diff CSR
        # over its few rows replaces the kernel outright. Banks
        # concatenate — the segment spaces are disjoint by construction
        # (sampling/sorted_batch._src_split_aux).
        from pyhgt_tpu.ops.pallas_seg import live_partials_pair

        cut = se.src_cut
        l1, l2 = live_partials_pair(d1[:cut], d2[:cut], lo)
        h1 = seg_sum_csr(l1, lo.ptr2)
        h2 = seg_sum_csr(l2, lo.ptr2)
        t1 = seg_sum_csr(d1[cut:], se.src_tail_ptr2)
        t2 = seg_sum_csr(d2[cut:], se.src_tail_ptr2)
        return (jnp.concatenate([h1, t1], axis=0),
                jnp.concatenate([h2, t2], axis=0))
    pm = getattr(se, "pseg_src_multi", None) if grouping == "src" else None
    if (pm is not None and _pallas_ok(d1, pm, use_pallas)
            and d1.shape == d2.shape):
        from pyhgt_tpu.ops.pallas_seg import live_partials_pair

        l1, l2 = live_partials_pair(d1, d2, pm)
        s1 = seg_sum_csr(l1, pm.ptr2)
        s2 = seg_sum_csr(l2, pm.ptr2)
        idx, inv = se.src_single_edges, se.src_single_inv
        z = jnp.zeros((1, d1.shape[1]), s1.dtype)
        g1 = jnp.concatenate([_rows(d1, idx).astype(s1.dtype), z], axis=0)
        g2 = jnp.concatenate([_rows(d2, idx).astype(s2.dtype), z], axis=0)
        return s1 + _rows(g1, inv), s2 + _rows(g2, inv)
    paux = getattr(se, paux_n, None)
    if _pallas_ok(d1, paux, use_pallas) and d1.shape == d2.shape:
        from pyhgt_tpu.ops.pallas_seg import live_partials_pair

        l1, l2 = live_partials_pair(d1, d2, paux)
        return seg_sum_csr(l1, paux.ptr2), seg_sum_csr(l2, paux.ptr2)
    return (
        _seg_sum_grouped(d1, se, grouping, use_pallas),
        _seg_sum_grouped(d2, se, grouping, use_pallas),
    )


def _head_mat(H, dk):
    """[D, H] one-hot map: column h is 1 on head h's dk lanes.

    ``x @ _head_mat`` sums each head's lanes ([E, D] -> [E, H]) and
    ``w @ _head_mat.T`` broadcasts per-head scalars to lanes
    ([E, H] -> [E, D]) — both as tiny MXU matmuls that keep the wide
    tensors in their native [E, D] row-major layout. The straightforward
    ``x.reshape(E, H, dk).sum(-1)`` / ``w[:, :, None] * v.reshape(...)``
    made XLA pick an E-minor layout for the 3-D form, inserting two
    463 MB layout copies per use (16 copies = 22 ms/step at bench scale,
    traced in docs/PERF_NOTES.md round-2)."""
    return jnp.repeat(jnp.eye(H, dtype=jnp.float32), dk, axis=0)


def _head_sum(x, H, dk):
    """Per-head lane sums: [E, D] f32 -> [E, H] f32 (exact: HIGHEST
    precision keeps f32 operand bits through the TPU's bf16 passes)."""
    return jnp.matmul(
        x, _head_mat(H, dk), precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _head_sum_prod(a, b, H, dk, use_pallas: bool):
    """``_head_sum(a ⊙ b)``.

    A fused Pallas kernel (ops/pallas_seg.py:head_sum_product) was built
    to keep the [E, D] product in VMEM, but it LOSES in the full step
    (178.8 vs 155.3 ms): one operand of each use (the q_e / g_msg row
    gather) is virtual under XLA — fused into this product — and a
    pallas_call input forces it to materialize, costing more than the
    product buffer it saves. Measured docs/PERF_NOTES.md round-2; the
    kernel stays for shapes where both operands are already resident."""
    del use_pallas
    return _head_sum(a.astype(jnp.float32) * b.astype(jnp.float32), H, dk)


def _head_expand(w, H, dk):
    """Per-head scalars to lanes: [E, H] f32 -> [E, D] f32."""
    return jnp.matmul(
        w, _head_mat(H, dk).T, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _head_expand_like(w, H, dk, dt):
    """:func:`_head_expand` emitted directly in the edge dtype.

    On the bf16 edge path the expand feeds a product that is cast to
    bf16 anyway, so emitting bf16 from the matmul
    (``preferred_element_type``) skips the f32 [E, D] intermediate and
    its converts — the product-build fusions ran at ~300 GB/s with ~2x
    their streaming traffic unaccounted (round-4b trace), consistent
    with that intermediate spilling. Numerics: ``w`` rounds to bf16 once
    (the 0/1 map is exact), the same class as the edge stage's per-tensor
    bf16 rounding contract. The f32 path is unchanged-exact."""
    if dt == jnp.bfloat16:
        return jnp.matmul(
            w, _head_mat(H, dk).T, preferred_element_type=jnp.bfloat16
        )
    return _head_expand(w, H, dk)


def _head_mat2(H, dk):
    """[2H, 2D] block-diagonal head-expand map: ``[coef ‖ w] @ _head_mat2``
    equals ``[_head_expand(coef) ‖ _head_expand(w)]`` in one matmul — the
    lane-concatenated ('slab') backward's broadcast (see _edge_bwd)."""
    m = _head_mat(H, dk).T                       # [H, D]
    z = jnp.zeros_like(m)
    return jnp.concatenate(
        [jnp.concatenate([m, z], axis=1), jnp.concatenate([z, m], axis=1)],
        axis=0,
    )


# --------------------------------------------------------------- edge stage
def _rows(table, idx):
    # indices are host-constructed and in-bounds by contract; skip XLA's
    # clamp on every gather
    return table.at[idx].get(mode="promise_in_bounds")


def _gather_kv(k_rel, v_rel, k_tab, v_tab, gidx, tabidx, use_rte):
    k_e = _rows(k_rel, gidx)
    v_e = _rows(v_rel, gidx)
    if use_rte:
        k_e = k_e + _rows(k_tab, tabidx)
        v_e = v_e + _rows(v_tab, tabidx)
    return k_e, v_e


def _attention(q_e, k_e, pri_e, mask, H, dk, use_pallas=False):
    pre = _head_sum_prod(q_e, k_e, H, dk, use_pallas) / jnp.sqrt(
        jnp.float32(dk)
    )
    att = pre * pri_e.astype(jnp.float32)
    att = jnp.where(mask[:, None], att, NEG)
    return pre, att


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def hgt_edge_stage(
    q_n,        # [N, D]  target queries (flat node space)
    k_rel,      # [G, D]  relation-transformed keys,   G = B*C
    v_rel,      # [G, D]
    k_tab,      # [Gt, D] RTE K tables, Gt = B*L (dummy zeros if RTE off)
    v_tab,      # [Gt, D]
    pri_e,      # [E, H]  per-edge relation prior (from one-hot matmul)
    dims,       # (H, dk, use_rte, save_kv) — static
    se,         # SortedEdges pytree (int/bool aux; cotangents are float0)
):
    return _edge_fwd_impl(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se)[0]


def _softmax_tiled(att, se, xr=None):
    m_n = seg_max_tiled(
        att, se.edge_tgt, se.live_last_tgt, se.live_key_tgt, se.seg_ptr2_tgt
    )
    m_n = _xreduce(m_n, xr, "max")   # cross-shard boundary exchange (gp)
    ex = jnp.exp(att - m_n[se.edge_tgt]) * se.edge_mask[:, None]
    den_n = seg_sum_tiled(ex, se.tl_tgt, se.live_idx_tgt, se.seg_ptr2_tgt)
    den_n = _xreduce(den_n, xr, "sum")
    den_e = jnp.maximum(den_n[se.edge_tgt], 1e-30)  # floor > min normal f32
    return ex / den_e


def _softmax_tilemax(att, se, K=_TILE, xr=None):
    """Segment softmax stabilized by the per-128-tile max instead of the
    per-segment running max — kills the 7-step shift scan
    (:func:`seg_max_tiled`), the narrow chain's largest component
    (probe9: the [E, 8] ops are 16x lane-padded, so every extra pass
    costs wide-pass money).

    ``xr``: on edge-partitioned runs the per-segment stabilizer crosses
    shards BEFORE the denominator forms (global max, then each shard's
    denominator against the global stabilizer, then sum) — exactly the
    flash-attention cross-device combine, same two [S, H] collectives
    as :func:`_softmax_tiled`.

    Math (exact online-softmax algebra): with ``m_t`` the max of tile t,
    ``den_seg = Σ_t exp(m_t - m_seg) · Σ_{e ∈ t ∩ seg} exp(att_e - m_t)``
    where ``m_seg = max_{t ∋ seg} m_t`` — an upper bound of every logit
    in the segment, so all scales are <= 1 (no overflow). The inner sums
    ride the existing one-hot level-1 einsum; the scale/combine runs on
    the tiny live-row space. Deviation vs the per-segment max: a row can
    underflow if another SEGMENT in its tile carries a logit >~88 above
    its own — impossible at trained-logit scales (|att| <~ 50) and
    guarded by the same den floor as the default path."""
    E, H = att.shape
    tiles = E // K
    a3 = att.reshape(tiles, K, H)
    m_tile = jnp.max(a3, axis=1)                           # [tiles, H]
    ex_t = (
        jnp.exp(a3 - m_tile[:, None, :]).reshape(E, H)
        * se.edge_mask[:, None]
    )
    # level 1: per-(tile, rank) partials of ex_t (same one-hot einsum as
    # seg_sum_tiled)
    oh = (
        se.tl_tgt.reshape(tiles, K)[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, K), 2)
    ).astype(jnp.float32)
    partial = jnp.einsum(
        "tkr,tkh->trh", oh, ex_t.reshape(tiles, K, H),
        preferred_element_type=jnp.float32,
    ).reshape(tiles * K, H)
    flat = jnp.concatenate(
        [partial, jnp.zeros((1, H), partial.dtype)], axis=0
    )
    live = flat[se.live_idx_tgt]                           # [M, H]
    # per-live-row LOG-SPACE combine: lse(t, seg) = m_tile + log(partial)
    # is the slice's exact logsumexp, so the per-segment stabilizer
    # m_n = max lse is within log(members) of the segment's true max —
    # every level-2 summand exp(lse - m_n) is O(1) and the cumsum-diff
    # combine loses no precision (a raw tile-max stabilizer left den
    # values on wildly different scales and the cumsum cancelled).
    tile_of = jnp.minimum(se.live_idx_tgt // K, tiles - 1)
    m_live = jnp.where(
        (se.live_idx_tgt < tiles * K)[:, None], m_tile[tile_of], NEG
    )
    lse_live = jnp.where(
        live > 0,
        m_live + jnp.log(jnp.maximum(live, 1e-38)),
        NEG,
    )
    m_n = seg_max_csr(lse_live, se.live_key_tgt, se.seg_ptr2_tgt)  # [S, H]
    m_n = _xreduce(m_n, xr, "max")   # cross-shard stabilizer (gp)
    S = m_n.shape[0]
    key_safe = jnp.minimum(se.live_key_tgt, S - 1)
    # against the GLOBAL stabilizer lse - m_n can be > 0 only through
    # shard-local float round-off; the min keeps scales <= 1 either way
    scale = jnp.exp(jnp.minimum(lse_live - m_n[key_safe], 0.0))
    den_n = _xreduce(seg_sum_csr(scale, se.seg_ptr2_tgt), xr, "sum")
    # pathology guard: if EVERY slice of a segment underflowed against
    # its tile max (logit spread > ~87 within a tile — beyond trained
    # scales), m_n is NEG and the combine knows nothing about the
    # segment; emit zeros there instead of exp(+inf)
    m_e = m_n[se.edge_tgt]
    ex = jnp.where(
        m_e > jnp.float32(-5e29),
        jnp.exp(jnp.minimum(att - m_e, 0.0)),
        0.0,
    ) * se.edge_mask[:, None]
    den_e = jnp.maximum(den_n[se.edge_tgt], 1e-30)
    return ex / den_e


# exp(att - m_tile) underflows to zero below ~-87.3 (f32 min normal);
# the guard trips with headroom so the auto path is bitwise-safe
TILEMAX_SPREAD = 80.0


def _softmax_tilemax_auto(att, se, K=_TILE, xr=None):
    """Runtime-guarded :func:`_softmax_tilemax` (VERDICT r3 #4).

    The tilemax softmax is exact whenever every live logit sits within
    ~87 of its 128-edge tile's max — true at trained-logit scales but not
    guaranteed. One cheap [E, H] reduction checks the bound per batch and
    ``lax.cond`` falls back to the shift-scan softmax on violation: both
    branches compile once, exactly one executes per step — the rank-cap
    fallback pattern applied at runtime instead of trace time.

    Measured on chip (round-4): the guard costs ~+3 ms over unguarded
    tilemax — the cond boundary stops XLA fusing ``w`` into its
    consumers, which outweighs the −2.4 ms the tilemax math saves. So
    ``"auto"`` is the *always-exact* option for arbitrary data, while
    the bench preset ships ``"on"`` (its trained logits are orders of
    magnitude inside the bound). See docs/PERF_NOTES.md round-4.
    """
    E, H = att.shape
    tiles = E // K
    a3 = att.reshape(tiles, K, H)
    m_tile = jnp.max(a3, axis=1, keepdims=True)           # [tiles, 1, H]
    live = se.edge_mask.reshape(tiles, K)[:, :, None]
    bad = jnp.any(((m_tile - a3) > TILEMAX_SPREAD) & live)
    if xr is not None:
        # every shard must take the SAME branch (both have collectives)
        bad = _xreduce(bad.reshape(1).astype(jnp.float32), xr, "max")[0] > 0
    return jax.lax.cond(
        bad,
        lambda a: _softmax_tiled(a, se, xr),
        lambda a: _softmax_tilemax(a, se, K, xr),
        att,
    )


def _softmax_pallas(att, se):
    """Segment softmax via the fused Pallas online-partials kernel
    (:func:`pyhgt_tpu.ops.pallas_seg.segment_softmax_partials`): one HBM
    pass over [E, H] emits per-(tile, rank) (max, sumexp) live rows; the
    level-2 online merge runs on the ~S-row live space; the final
    normalize fuses into downstream consumers."""
    from pyhgt_tpu.ops.pallas_seg import segment_softmax_partials

    paux = se.pseg_tgt
    S = paux.ptr2.shape[0] - 1
    m_rows, s_rows = segment_softmax_partials(att, paux)
    key = paux.live_key
    m_n = seg_max_csr(m_rows, key, paux.ptr2)              # [S, H]
    key_safe = jnp.minimum(key, S - 1)
    # online merge: den = sum over live rows of exp(m_row - m_seg) * s_row
    scale = jnp.exp(jnp.minimum(m_rows - m_n[key_safe], 0.0))
    den_n = seg_sum_csr(scale * s_rows, paux.ptr2)
    ex = jnp.exp(att - m_n[se.edge_tgt]) * se.edge_mask[:, None]
    den_e = jnp.maximum(den_n[se.edge_tgt], 1e-30)
    return ex / den_e


def _edge_fwd_impl(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se):
    H, dk, use_rte = dims[0], dims[1], dims[2]
    seg_pallas = len(dims) > 5 and dims[5]
    D = q_n.shape[-1]
    E = se.edge_tgt.shape[0]
    dt = k_rel.dtype
    k_e, v_e = _gather_kv(k_rel, v_rel, k_tab, v_tab, se.gidx, se.tabidx, use_rte)
    q_e = _rows(q_n, se.edge_tgt)
    pre, att = _attention(q_e, k_e, pri_e, se.edge_mask, H, dk, seg_pallas)
    # the online-partials softmax kernel wins standalone (3.9 vs 4.8 ms
    # marginal, probe8-p5) but LOST 15 ms in the full step (scheduling /
    # fusion interaction) — off by default, selectable via dims[6]
    softmax_pallas = len(dims) > 6 and dims[6]
    softmax_tilemax = len(dims) > 9 and dims[9]
    xr = dims[10] if len(dims) > 10 else None
    if (
        xr is None
        and softmax_pallas
        and se.pseg_tgt is not None
        and getattr(se.pseg_tgt, "live_key", None) is not None
        and not getattr(se.pseg_tgt, "v", 0)  # the softmax kernel's
        # retire logic assumes the legacy V = K width, not a rank cap
    ):
        w = _softmax_pallas(att, se)                         # [E, H] f32
    elif softmax_tilemax:
        # dims[9]: 0 off | 1 unguarded tilemax | 2 runtime-guarded auto
        # (xr-aware: the stabilizer/denominator cross graph shards)
        if softmax_tilemax == 2:
            w = _softmax_tilemax_auto(att, se, xr=xr)        # [E, H] f32
        else:
            w = _softmax_tilemax(att, se, xr=xr)             # [E, H] f32
    else:
        w = _softmax_tiled(att, se, xr)                      # [E, H] f32
    # per-edge messages formed in VMEM on the Pallas path (never hit HBM);
    # fallback writes them in the operand dtype (bf16 when the caller runs
    # the edge stage in bf16) — either way segment sums accumulate f32
    aggr = _seg_sum_weighted(w, v_e, H, dk, se, "tgt", seg_pallas, dt)
    return aggr, w, pre, k_e, v_e


def _edge_fwd(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se):
    save_kv = len(dims) > 3 and dims[3]
    aggr, w, pre, k_e, v_e = _edge_fwd_impl(
        q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se
    )
    kv = (k_e, v_e) if save_kv else None
    # `pre` ([E, H], the pri-less attention logits) rides along so the
    # backward never re-gathers q_e in target order — 7 MB at bench scale
    res = (q_n, k_rel, v_rel, k_tab, v_tab, pri_e, w, pre, kv, se)
    return aggr, res


def _edge_bwd(dims, res, g_aggr):
    """Scatter-free backward; two strategies for the src/tab-grouped
    gradient reductions, selected statically by ``dims[4]``:

    - ``permute`` (round-1): compute g_k_e/g_v_e once in tgt order, then
      permute-gather each [E, D] tensor into src/tab-sorted order. XLA
      fuses the elementwise product INTO the permute, so each grouping
      costs 2 fused [E, D] passes.
    - ``recompute``: never permute [E, D]; re-gather q/g_aggr rows from
      node-sized tables natively in each sorted order (cheap [E, H]
      coefficient permutes + reuse-heavy [N, D] gathers) and recompute
      the products there. Halves the *random-read* traffic but doubles
      the product writes — measured SLOWER in f32 (365 vs 304 ms/step,
      docs/PERF_NOTES.md round-2); kept selectable for bf16.
    """
    (q_n, k_rel, v_rel, k_tab, v_tab, pri_e, w, pre, kv, se) = res
    H, dk, use_rte = dims[0], dims[1], dims[2]
    recompute = len(dims) > 4 and dims[4]
    seg_pallas = len(dims) > 5 and dims[5]
    D = q_n.shape[-1]
    E = se.edge_tgt.shape[0]
    dt = k_rel.dtype
    mask = se.edge_mask

    if kv is not None:
        k_e, v_e = kv                  # saved: no backward re-gathers
    else:
        k_e, v_e = _gather_kv(
            k_rel, v_rel, k_tab, v_tab, se.gidx, se.tabidx, use_rte
        )

    g_aggr_l = g_aggr.astype(dt)                           # [N, D] table
    g_msg = _rows(g_aggr_l, se.edge_tgt)                   # node gather
    g_msg_f = g_msg.astype(jnp.float32)
    g_w = _head_sum_prod(g_msg, v_e, H, dk, seg_pallas)    # [E, H]

    # softmax backward: g_att = w * (g_w - sum_seg(w * g_w)); the sum
    # crosses graph shards on partitioned runs
    xr = dims[10] if len(dims) > 10 else None
    s_n = _xreduce(
        seg_sum_tiled(w * g_w, se.tl_tgt, se.live_idx_tgt, se.seg_ptr2_tgt),
        xr, "sum",
    )
    g_att = w * (g_w - s_n[se.edge_tgt])
    g_att = jnp.where(mask[:, None], g_att, 0.0)

    g_pri_e = g_att * pre                                  # [E, H]
    coef = g_att * pri_e.astype(jnp.float32) / jnp.sqrt(jnp.float32(dk))

    # tgt-grouped: g_q_n (k_e is already in tgt order) — fused weighted
    # reduction on the Pallas path. All remaining per-head broadcast
    # products go through _head_expand to keep [E, D] row-major (the 3-D
    # reshape form costs a layout copy pair per use — see _head_mat)
    g_q_n = _seg_sum_weighted(coef, k_e, H, dk, se, "tgt", seg_pallas, dt)

    if recompute:
        q_l = q_n.astype(dt)

        def grads_in_order(perm, tgt_order, grouping):
            """g_k (= coef⊙q_tgt) and g_v (= w⊙g_aggr_tgt) segment sums
            over one grouping, recomputed natively in that grouping's
            edge order."""
            # narrow [E, H] permutes, then head-expanded to [E, D] lanes
            coef_o = _head_expand(_rows(coef, perm), H, dk)
            w_o = _head_expand(_rows(w, perm), H, dk)
            q_o = _rows(q_l, tgt_order).astype(jnp.float32)
            gm_o = _rows(g_aggr_l, tgt_order).astype(jnp.float32)
            g_k = (coef_o * q_o).astype(dt)
            g_v = (w_o * gm_o).astype(dt)
            return _seg_sum_grouped_pair(g_k, g_v, se, grouping, seg_pallas)

        g_k_rel, g_v_rel = grads_in_order(
            se.perm_src, se.tgt_src_order, "src"
        )
        if use_rte:
            g_k_tab, g_v_tab = grads_in_order(
                se.perm_tab, se.tgt_tab_order, "tab"
            )
        else:
            g_k_tab = jnp.zeros_like(k_tab)
            g_v_tab = jnp.zeros_like(v_tab)
    else:
        src_direct = len(dims) > 7 and dims[7]
        bwd_slab = len(dims) > 8 and dims[8]
        paux_src = getattr(se, "pseg_src", None)
        if (bwd_slab and not src_direct and seg_pallas
                and paux_src is not None and D >= 128):
            # 'slab' strategy: lane-concatenate the pair so the backward
            # pays ONE [E, 2D] permute-gather instead of two [E, D] ones
            # (permutes are row-size-bound: [E,1024]bf16 4.8 ms vs
            # 2x[E,512] 6.6 ms, probe p2) and ONE node-table gather
            # instead of two. Algebra identical to the permute strategy.
            from pyhgt_tpu.ops.pallas_seg import live_partials_slab

            table = jnp.concatenate([q_n.astype(dt), g_aggr_l], axis=1)
            qgm = _rows(table, se.edge_tgt).astype(jnp.float32)  # [E, 2D]
            cw = jnp.concatenate([coef, w], axis=1)              # [E, 2H]
            cw_exp = jnp.matmul(
                cw, _head_mat2(H, dk),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            g_kv_e = (cw_exp * qgm).astype(dt)                   # [E, 2D]
            g_kv_src = _rows(g_kv_e, se.perm_src)                # 1 permute
            l1, l2 = live_partials_slab(g_kv_src, paux_src)
            g_k_rel = seg_sum_csr(l1, paux_src.ptr2)
            g_v_rel = seg_sum_csr(l2, paux_src.ptr2)
            if use_rte:
                ptab = getattr(se, "ptab_src", None)
                if ptab is not None:
                    t1, t2 = live_partials_slab(g_kv_src, ptab)
                    g_k_tab = seg_sum_csr(t1, ptab.ptr2)
                    g_v_tab = seg_sum_csr(t2, ptab.ptr2)
                else:
                    ptab2 = se.pseg_tab
                    t1, t2 = live_partials_slab(
                        _rows(g_kv_e, se.perm_tab), ptab2)
                    g_k_tab = seg_sum_csr(t1, ptab2.ptr2)
                    g_v_tab = seg_sum_csr(t2, ptab2.ptr2)
            else:
                g_k_tab = jnp.zeros_like(k_tab)
                g_v_tab = jnp.zeros_like(v_tab)
        else:
            if src_direct:
                # hybrid: build g_k/g_v natively in src order — coef/w
                # permute narrow [E, H], the wide reads are reuse-heavy
                # [N, D]-table gathers at tgt_src_order. Skips the
                # tgt-order q_e gather AND both [E, D] src permutes
                # (3 wide passes -> 2). Only pays off now that the tab
                # grouping also rides the src-ordered tensors (full
                # recompute of BOTH orders measured slower, see
                # docs/PERF_NOTES.md).
                coef_s = _head_expand(_rows(coef, se.perm_src), H, dk)
                w_s = _head_expand(_rows(w, se.perm_src), H, dk)
                q_s = _rows(
                    q_n.astype(dt), se.tgt_src_order
                ).astype(jnp.float32)
                gm_s = _rows(g_aggr_l, se.tgt_src_order).astype(jnp.float32)
                gk_src = (coef_s * q_s).astype(dt)
                gv_src = (w_s * gm_s).astype(dt)
            else:
                # permute strategy: one product per tensor, fused into the
                # permute; the paired kernel shares the grid pass + one-hot
                # per grouping
                if dt == jnp.bfloat16:
                    # bf16-native products (no f32 [E, D] intermediates,
                    # see _head_expand_like); q_e / g_msg are bf16 rows
                    q_e = _rows(q_n, se.edge_tgt)
                    g_k_e = _head_expand_like(coef, H, dk, dt) * q_e
                    g_v_e = _head_expand_like(w, H, dk, dt) * g_msg
                else:
                    q_e = _rows(q_n, se.edge_tgt).astype(jnp.float32)
                    g_k_e = (_head_expand(coef, H, dk) * q_e).astype(dt)
                    g_v_e = (_head_expand(w, H, dk) * g_msg_f).astype(dt)
                gk_src = _rows(g_k_e, se.perm_src)
                gv_src = _rows(g_v_e, se.perm_src)
            g_k_rel, g_v_rel = _seg_sum_grouped_pair(
                gk_src, gv_src, se, "src", seg_pallas
            )
            if use_rte:
                ptab = getattr(se, "ptab_src", None)
                if _pallas_ok(gk_src, ptab, seg_pallas):
                    # tab-window kernel: the RTE-table sums come straight
                    # off the src-ordered tensors (blocks are contiguous
                    # there, so (block, Δt) fits the 2W carry window) —
                    # the two [E, D] tab permutes vanish
                    # (sampling/sorted_batch.py aux)
                    from pyhgt_tpu.ops.pallas_seg import live_partials_pair

                    l1, l2 = live_partials_pair(gk_src, gv_src, ptab)
                    g_k_tab = seg_sum_csr(l1, ptab.ptr2)
                    g_v_tab = seg_sum_csr(l2, ptab.ptr2)
                elif src_direct:
                    # no window aux: rebuild the pair natively in tab
                    # order (same recipe as the src build above)
                    coef_t = _head_expand(_rows(coef, se.perm_tab), H, dk)
                    w_t = _head_expand(_rows(w, se.perm_tab), H, dk)
                    q_t = _rows(q_n.astype(dt), se.tgt_tab_order)
                    gm_t = _rows(g_aggr_l, se.tgt_tab_order)
                    g_k_tab, g_v_tab = _seg_sum_grouped_pair(
                        (coef_t * q_t.astype(jnp.float32)).astype(dt),
                        (w_t * gm_t.astype(jnp.float32)).astype(dt),
                        se, "tab", seg_pallas,
                    )
                else:
                    g_k_tab, g_v_tab = _seg_sum_grouped_pair(
                        _rows(g_k_e, se.perm_tab), _rows(g_v_e, se.perm_tab),
                        se, "tab", seg_pallas,
                    )
            else:
                g_k_tab = jnp.zeros_like(k_tab)
                g_v_tab = jnp.zeros_like(v_tab)

    def f0_like(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.inexact):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    g_se = jax.tree.map(f0_like, res[9])
    return (
        g_q_n.astype(q_n.dtype), g_k_rel.astype(k_rel.dtype),
        g_v_rel.astype(v_rel.dtype), g_k_tab.astype(k_tab.dtype),
        g_v_tab.astype(v_tab.dtype), g_pri_e.astype(pri_e.dtype),
        g_se,
    )


hgt_edge_stage.defvjp(_edge_fwd, _edge_bwd)


def _tab_select(k_tab, v_tab, tab_sel, B, L, Dout, dense_max=None):
    """Compact-table row selection as a one-hot matmul (scatter-free).

    ``k_tab[tab_sel]`` would be a plain gather, but its autodiff
    transpose is a duplicate-index [B*cap -> B*L] scatter-add (dead
    compact slots repeat their block's last row) — the ONE scatter that
    had survived in the edge stage, and XLA:TPU compiled it
    pathologically: 412 s vs 46 s compiles at bench shapes, and
    compile-wedge + worker kernel faults at the 26880 / 74k-proxy shape
    families (round-4b bisect, docs/runs/ogbn_mag_proxy_r4.json). The
    one-hot matmul's gradient is the transposed matmul — the ``pri_e``
    trick — and is exact (0/1 map at HIGHEST precision).

    Two algebraically identical forms: the dense [B*cap, B*L] map (the
    chip-validated form at bench scale: 119.8 ms, compiles ~4x faster
    than the gather) and, above ``_TAB_SELECT_DENSE_MAX`` table rows, a
    per-block batched [B, cap, L] one-hot — ``tab_sel`` only selects
    within its own block, so the block-diagonal form is linear in B
    where the dense map grows quadratically (55+ MB constant for a
    ~30-block OAG-like schema)."""
    sel = jnp.asarray(tab_sel)
    if dense_max is None:
        dense_max = _TAB_SELECT_DENSE_MAX
    if B * L <= dense_max:
        sel_oh = (
            sel[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, B * L), 1)
        ).astype(k_tab.dtype)                          # [B*cap, B*L]
        mm = lambda t: jnp.matmul(
            sel_oh, t, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=t.dtype,
        )
        return mm(k_tab), mm(v_tab)
    cap = sel.shape[0] // B
    sel_loc = (
        sel.reshape(B, cap) - (jnp.arange(B, dtype=sel.dtype) * L)[:, None]
    )                                                  # [B, cap] in [0, L)
    sel_oh = (
        sel_loc[:, :, None]
        == jax.lax.broadcasted_iota(sel_loc.dtype, (1, 1, L), 2)
    ).astype(k_tab.dtype)                              # [B, cap, L]
    bmm = lambda t: jax.lax.dot_general(
        sel_oh, t.reshape(B, L, Dout),
        (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=t.dtype,
    ).reshape(B * cap, Dout)
    return bmm(k_tab), bmm(v_tab)


# dense one-hot selection up to this many table rows (bench: B*L = 2880);
# beyond it the block-diagonal batched form avoids the quadratic constant
_TAB_SELECT_DENSE_MAX = 4096


# ------------------------------------------------------------- full conv core
def hgt_conv_core_sorted(
    x,                 # [T, C, Din]
    se,                # SortedEdges (host-precomputed, device arrays)
    em,                # EdgeStaticMeta (static)
    *,
    wq, bq, wk, bk, wv, bv,
    rel_pri, rel_att, rel_msg,
    n_heads: int,
    rte_vec=None,      # [L, Din] or None
    save_kv: bool = False,
    edge_dtype=None,   # e.g. jnp.bfloat16: run the per-edge stage in bf16
    bwd_recompute: bool = False,  # see _edge_bwd: permute vs recompute
    seg_pallas: bool = False,  # route wide segment sums through ops/pallas_seg
    softmax_pallas: bool = False,  # fused online-softmax kernel (see
    # _edge_fwd_impl: standalone win, full-step loss — experimental)
    bwd_src_direct: bool = False,  # hybrid backward: build the src-grouped
    # g_k/g_v pair natively in src order (see _edge_bwd)
    bwd_slab: bool = False,  # lane-concatenated backward: ONE [E, 2D]
    # permute + slab pair kernel instead of two [E, D] permutes
    softmax_tilemax=False,  # per-tile-max online softmax (kills the
    # 7-step shift scan; see _softmax_tilemax). False/0 off, True/1 on
    # (logit-spread domain bound unchecked), "auto"/2 = runtime-guarded:
    # a per-batch spread check + lax.cond fallback to the scan softmax
    # (_softmax_tilemax_auto) makes it always exact
    axis_name: str = "",  # graph-axis name: se is one shard of a
    # partitioned batch; softmax stats + aggregation cross shards
    gp_overlap: bool = False,  # ring-allreduce boundary exchange
    return_attention: bool = False,  # also return the [E, H] softmax
    # weights the edge stage used (viz parity: same inputs, same impl —
    # HGTConv.attention_weights rides this instead of rebuilding the
    # prologue, so the two cannot drift)
):
    """Same contract as :func:`pyhgt_tpu.ops.hgt.hgt_conv_core` but over the
    target-sorted layout — scatter-free forward and backward. ``save_kv``
    trades 2 E×D residual buffers for 2 fewer backward HBM gathers.

    ``edge_dtype=jnp.bfloat16`` casts the gathered tables (Q/K/V banks and
    RTE tables) and every per-edge [E, D] tensor to bf16 — halving the
    HBM-bound gather/reduce traffic that dominates the edge stage — while
    attention logits, softmax, and all segment accumulations stay f32
    (mixed-precision: values round to bf16 once per tensor, sums never
    accumulate in bf16)."""
    from pyhgt_tpu.ops.hgt import (
        _block_relation_transform,
        _rte_block_tables,
        typed_linear,
    )

    T, C, Din = x.shape
    Dout = wq.shape[-1]
    H, dk = n_heads, Dout // n_heads
    N = T * C

    # NOTE: fusing Q/K/V into one [T,Din,3D] matmul and K|V relation
    # transforms into one stacked einsum was measured SLOWER (312 vs
    # 304 ms/step) — the stack/split copies outweigh the fusion.
    q = typed_linear(x, wq, bq).reshape(T, C, H, dk)
    k = typed_linear(x, wk, bk).reshape(T, C, H, dk)
    v = typed_linear(x, wv, bv).reshape(T, C, H, dk)
    k_rel = _block_relation_transform(k, rel_att, em)
    v_rel = _block_relation_transform(v, rel_msg, em)
    B = k_rel.shape[0]
    k_rel = k_rel.reshape(B * C, Dout)
    v_rel = v_rel.reshape(B * C, Dout)

    use_rte = rte_vec is not None
    if use_rte:
        L = rte_vec.shape[0]
        k_tab = _rte_block_tables(rte_vec, wk, rel_att, em, H, dk).reshape(B * L, Dout)
        v_tab = _rte_block_tables(rte_vec, wv, rel_msg, em, H, dk).reshape(B * L, Dout)
        tab_sel = getattr(se, "tab_sel", None)
        if tab_sel is not None:
            # tab compaction (round-4): keep only the per-block OCCUPIED
            # (block, Δt) table rows — se.tabidx and every tab aux are
            # already in the compact space (sampling/sorted_batch.
            # _compact_tab). The selection is a one-hot matmul, NOT a
            # row gather: the gather's autodiff transpose is a
            # duplicate-index [B*cap -> B*L] scatter-add (dead compact
            # slots repeat their block's last row), and that scatter sent
            # XLA:TPU into pathological compiles — 412 s vs 46 s at bench
            # shapes, and outright compile-wedge/worker-kernel-faults at
            # the 26880 and 74k-proxy shape families (round-4b bisect,
            # docs/runs/ogbn_mag_proxy_r4.json). The matmul's gradient is
            # the transposed matmul (exact: one-hot at HIGHEST), the same
            # trick as `pri_e` below; at [B*cap, B*L] size it is sub-ms.
            k_tab, v_tab = _tab_select(k_tab, v_tab, tab_sel, B, L, Dout)
    else:
        k_tab = jnp.zeros((1, Dout), dtype=x.dtype)
        v_tab = jnp.zeros((1, Dout), dtype=x.dtype)

    # relation prior via one-hot matmul (gradient = transposed matmul)
    pri_e = se.rel_onehot @ rel_pri                       # [E, H]

    q_n = q.reshape(N, Dout)
    if edge_dtype is not None:
        q_n = q_n.astype(edge_dtype)
        k_rel = k_rel.astype(edge_dtype)
        v_rel = v_rel.astype(edge_dtype)
        k_tab = k_tab.astype(edge_dtype)
        v_tab = v_tab.astype(edge_dtype)

    xr = (axis_name, gp_overlap) if axis_name else None
    tilemax_mode = 2 if softmax_tilemax == "auto" else int(
        bool(softmax_tilemax))
    dims = (H, dk, use_rte, save_kv, bwd_recompute, seg_pallas,
            softmax_pallas, bwd_src_direct, bwd_slab, tilemax_mode, xr)
    aggr = hgt_edge_stage(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se)
    if xr is not None:
        # per-shard partial aggregations combine once per layer (outside
        # the custom VJP: its transpose replicates g_aggr, exactly the
        # partitioned backward's contract)
        aggr = _xreduce(aggr.astype(jnp.float32), xr, "sum")
    out = aggr.reshape(T, C, Dout).astype(x.dtype)
    if return_attention:
        w = hgt_edge_attention(q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
                               dims, se)
        return out, w
    return out


def hgt_edge_attention(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se):
    """Return the [E, H] softmax attention weights (the reference stashes
    them on the module for visualization, ``pyHGT/conv.py:106-108``)."""
    return _edge_fwd_impl(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims, se)[1]
