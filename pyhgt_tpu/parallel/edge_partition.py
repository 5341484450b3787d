"""Edge-partitioned HGT — the graph analogue of sequence/context parallelism.

The reference has no distributed execution at all (SURVEY.md §2.9); its
scaling lever is sampling smaller subgraphs. Here one *large* subgraph is
partitioned across a ``graph`` mesh axis:

- the target-sorted edge array splits into contiguous per-device slices
  (host-side, :func:`partition_sorted`), so each slice stays sorted and
  carries its own CSR/CSC pointers;
- node-level tensors (queries, relation-transformed K/V banks, RTE
  tables) are replicated along ``graph`` — they are O(N·D), edges are
  O(E·D), E >> N;
- softmax statistics cross shards with one ``pmax`` + one ``psum`` of
  ``[N, H]`` (the "boundary exchange" — it rides ICI), and the partial
  ``[N, D]`` aggregations ``psum`` once per layer;
- the backward is the same hand-derived scatter-free VJP as the
  single-chip path, with one extra ``[N, H]`` ``psum`` for the softmax
  Jacobian term; gradients of the replicated node tensors are psum'd by
  the shard_map transpose automatically.

Composes with data parallelism (outer vmap over the ``data`` axis) and
head-axis tensor parallelism (``model`` axis) on one mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from pyhgt_tpu.ops.rte import RTE_MAX_LEN
from pyhgt_tpu.ops.sorted_hgt import (
    NEG,
    _attention,
    _gather_kv,
    _head_expand,
    _head_sum,
    seg_max_csr,
    seg_sum_csr,
)
from pyhgt_tpu.sampling.sorted_batch import SortedEdges

from pyhgt_tpu.parallel.mesh import GRAPH_AXIS  # single source of truth


@struct.dataclass
class PartitionedEdges:
    """Per-shard sorted edge arrays, stacked on a leading [P] axis."""

    edge_tgt: np.ndarray      # [P, Ep]
    gidx: np.ndarray          # [P, Ep]
    tabidx: np.ndarray        # [P, Ep]
    mask_f: np.ndarray        # [P, Ep] f32
    rel_onehot: np.ndarray    # [P, Ep, R]
    seg_ptr_tgt: np.ndarray   # [P, N+1]
    perm_src: np.ndarray      # [P, Ep]
    seg_ptr_src: np.ndarray   # [P, G+1]
    perm_tab: np.ndarray      # [P, Gt+1... actually [P, Ep]]
    seg_ptr_tab: np.ndarray   # [P, Gt+1]


def partition_sorted(se: SortedEdges, n_parts: int, num_blocks: int,
                     node_cap: int, num_nodes_flat: int) -> PartitionedEdges:
    """Split a target-sorted edge view into ``n_parts`` contiguous slices
    with per-slice CSR/CSC pointers (host-side, numpy)."""
    E = se.edge_tgt.shape[0]
    if E % n_parts:
        raise ValueError(f"E={E} not divisible by n_parts={n_parts}")
    Ep = E // n_parts
    N = num_nodes_flat
    G = num_blocks * node_cap
    Gt = num_blocks * RTE_MAX_LEN

    f = lambda a: a.reshape(n_parts, Ep, *a.shape[1:])
    edge_tgt = f(se.edge_tgt)
    gidx = f(se.gidx)
    tabidx = f(se.tabidx)
    mask = f(se.edge_mask)
    onehot = f(se.rel_onehot)

    seg_ptr_tgt = np.zeros((n_parts, N + 1), np.int32)
    perm_src = np.zeros((n_parts, Ep), np.int32)
    seg_ptr_src = np.zeros((n_parts, G + 1), np.int32)
    perm_tab = np.zeros((n_parts, Ep), np.int32)
    seg_ptr_tab = np.zeros((n_parts, Gt + 1), np.int32)
    from pyhgt_tpu.sampling.sorted_batch import _native_batch

    nb = _native_batch()  # C++ counting sorts when available (same output)
    for p in range(n_parts):
        m = mask[p]
        key = np.where(m, edge_tgt[p], N).astype(np.int32)
        key_src = np.where(m, gidx[p], G).astype(np.int32)
        key_tab = np.where(m, tabidx[p], Gt).astype(np.int32)
        if nb is not None:
            _, seg_ptr_tgt[p] = nb.counting_sort(key, N)
            perm_src[p], seg_ptr_src[p] = nb.counting_sort(key_src, G)
            perm_tab[p], seg_ptr_tab[p] = nb.counting_sort(key_tab, Gt)
        else:
            # slices of a sorted array are sorted; recompute local pointers
            seg_ptr_tgt[p] = np.searchsorted(key, np.arange(N + 1))
            perm_src[p] = np.argsort(key_src, kind="stable")
            seg_ptr_src[p] = np.searchsorted(
                key_src[perm_src[p]], np.arange(G + 1))
            perm_tab[p] = np.argsort(key_tab, kind="stable")
            seg_ptr_tab[p] = np.searchsorted(
                key_tab[perm_tab[p]], np.arange(Gt + 1))

    return PartitionedEdges(
        edge_tgt=edge_tgt.astype(np.int32),
        gidx=gidx.astype(np.int32),
        tabidx=tabidx.astype(np.int32),
        mask_f=mask.astype(np.float32),
        rel_onehot=onehot.astype(np.float32),
        seg_ptr_tgt=seg_ptr_tgt,
        perm_src=perm_src,
        seg_ptr_src=seg_ptr_src,
        perm_tab=perm_tab,
        seg_ptr_tab=seg_ptr_tab,
    )


# ---------------------------------------------------------------------------
def _ring_allreduce(x, axis: str, op: str = "sum"):
    """Manual bidirectional-free ring allreduce: reduce-scatter then
    all-gather, one 1/P-sized chunk per ``ppermute`` hop.

    Why this exists next to ``lax.psum``: XLA emits the psum as one
    monolithic all-reduce that serializes after the producing compute.
    The ring form moves P-1 small hops instead, which real ICI can
    overlap with neighbouring compute (and which slots into a future
    per-chunk compute/communication pipeline). On the virtual CPU mesh it
    is a pure CORRECTNESS artifact — parity-tested vs psum so that
    real-multi-chip time is measurement, not development (VERDICT r2 #6).
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

    # reduce-scatter: at step s device i sends chunk (i - s) mod P and
    # folds the incoming chunk (i - s - 1) mod P into its buffer; after
    # P-1 steps chunk (i + 1) mod P is fully reduced on device i
    buf = x
    send = chunk(buf, idx % P)
    for s in range(P - 1):
        recv = jax.lax.ppermute(send, axis, perm)
        j = (idx - s - 1) % P
        send = combine(chunk(buf, j), recv)
        buf = put(buf, send, j)
    # all-gather: circulate the reduced chunks; at step s device i
    # receives chunk (i - s) mod P from its left neighbour
    g = send
    for s in range(P - 1):
        g = jax.lax.ppermute(g, axis, perm)
        j = (idx - s) % P
        buf = put(buf, g, j)
    return buf[:n0]


def _xreduce(x, axis: str, op: str, overlap: bool):
    if overlap:
        return _ring_allreduce(x, axis, op)
    return jax.lax.pmax(x, axis) if op == "max" else jax.lax.psum(x, axis)


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _edge_stage_local(
    q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
    dims: Tuple[int, int, bool, str],   # (H, dk, use_rte, axis_name)
    edge_tgt, gidx, tabidx, mask_f,
    seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab,
):
    aggr, _ = _part_fwd_impl(
        q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims,
        edge_tgt, gidx, tabidx, mask_f,
        seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab,
    )
    return aggr


def _part_fwd_impl(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims,
                   edge_tgt, gidx, tabidx, mask_f,
                   seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab):
    H, dk, use_rte, axis = dims[:4]
    overlap = len(dims) > 4 and dims[4]
    D = q_n.shape[-1]
    E = edge_tgt.shape[0]
    mask = mask_f > 0
    k_e, v_e = _gather_kv(k_rel, v_rel, k_tab, v_tab, gidx, tabidx, use_rte)
    q_e = q_n[edge_tgt]
    _pre, att = _attention(q_e, k_e, pri_e, mask, H, dk)
    # cross-shard softmax statistics (the boundary exchange)
    m_n = _xreduce(seg_max_csr(att, edge_tgt, seg_ptr_tgt), axis, "max",
                   overlap)                                             # [N, H]
    ex = jnp.exp(att - m_n[edge_tgt]) * mask[:, None]
    den_n = _xreduce(seg_sum_csr(ex, seg_ptr_tgt), axis, "sum", overlap)
    den_n = jnp.maximum(den_n, 1e-30)
    w = ex / den_n[edge_tgt]
    # per-head broadcast via the one-hot MXU matmul — the [E, H, dk]
    # reshape forms cost a wide layout-copy pair per use (the measured
    # rule in docs/PERF_NOTES.md / DESIGN.md §4)
    msg = _head_expand(w, H, dk) * v_e.astype(jnp.float32)
    aggr_p = seg_sum_csr(msg, seg_ptr_tgt)                               # [N, D]
    return aggr_p, w


def _part_fwd(q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims,
              edge_tgt, gidx, tabidx, mask_f,
              seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab):
    aggr_p, w = _part_fwd_impl(
        q_n, k_rel, v_rel, k_tab, v_tab, pri_e, dims,
        edge_tgt, gidx, tabidx, mask_f,
        seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab,
    )
    res = (q_n, k_rel, v_rel, k_tab, v_tab, pri_e, w,
           edge_tgt, gidx, tabidx, mask_f,
           seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab)
    return aggr_p, res


def _part_bwd(dims, res, g_aggr):
    (q_n, k_rel, v_rel, k_tab, v_tab, pri_e, w,
     edge_tgt, gidx, tabidx, mask_f,
     seg_ptr_tgt, perm_src, seg_ptr_src, perm_tab, seg_ptr_tab) = res
    H, dk, use_rte, axis = dims[:4]
    overlap = len(dims) > 4 and dims[4]
    D = q_n.shape[-1]
    E = edge_tgt.shape[0]
    mask = mask_f > 0

    k_e, v_e = _gather_kv(k_rel, v_rel, k_tab, v_tab, gidx, tabidx, use_rte)
    q_e = q_n[edge_tgt]
    pre, _att = _attention(q_e, k_e, pri_e, mask, H, dk)

    g_aggr = g_aggr.astype(jnp.float32)
    g_msg = g_aggr[edge_tgt]
    g_w = _head_sum(g_msg * v_e.astype(jnp.float32), H, dk)
    g_v_e = _head_expand(w, H, dk) * g_msg

    # softmax backward with the cross-shard Jacobian term
    s_n = _xreduce(seg_sum_csr(w * g_w, seg_ptr_tgt), axis, "sum",
                   overlap)                                       # [N, H]
    g_att = w * (g_w - s_n[edge_tgt])
    g_att = jnp.where(mask[:, None], g_att, 0.0)

    g_pri_e = g_att * pre
    coef = g_att * pri_e.astype(jnp.float32) / jnp.sqrt(jnp.float32(dk))
    coef_l = _head_expand(coef, H, dk)
    g_q_e = coef_l * k_e.astype(jnp.float32)
    g_k_e = coef_l * q_e.astype(jnp.float32)

    g_q_n = seg_sum_csr(g_q_e, seg_ptr_tgt)
    g_k_rel = seg_sum_csr(g_k_e[perm_src], seg_ptr_src)
    g_v_rel = seg_sum_csr(g_v_e[perm_src], seg_ptr_src)
    if use_rte:
        g_k_tab = seg_sum_csr(g_k_e[perm_tab], seg_ptr_tab)
        g_v_tab = seg_sum_csr(g_v_e[perm_tab], seg_ptr_tab)
    else:
        g_k_tab = jnp.zeros_like(k_tab)
        g_v_tab = jnp.zeros_like(v_tab)

    f0 = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (
        g_q_n.astype(q_n.dtype), g_k_rel.astype(k_rel.dtype),
        g_v_rel.astype(v_rel.dtype), g_k_tab.astype(k_tab.dtype),
        g_v_tab.astype(v_tab.dtype), g_pri_e.astype(pri_e.dtype),
        f0(edge_tgt), f0(gidx), f0(tabidx), jnp.zeros_like(mask_f),
        f0(seg_ptr_tgt), f0(perm_src), f0(seg_ptr_src),
        f0(perm_tab), f0(seg_ptr_tab),
    )


_edge_stage_local.defvjp(_part_fwd, _part_bwd)


def hgt_conv_core_partitioned(
    x,              # [T, C, Din] (replicated along the graph axis)
    pe_local,       # PartitionedEdges *local block* (leading [P] axis eaten
                    # by shard_map: arrays arrive [Ep, ...]/[N+1] etc.)
    em,
    *,
    wq, bq, wk, bk, wv, bv,
    rel_pri, rel_att, rel_msg,
    n_heads: int,
    rte_vec=None,
    axis_name: str = GRAPH_AXIS,
    overlap: bool = False,
):
    """Edge-partitioned HGT attention. Must be called INSIDE a shard_map
    over ``axis_name``; returns the full (psum'd) aggregation [T, C, Dout].

    ``overlap=True`` routes every boundary exchange (softmax stats, the
    [N, D] aggregation, the backward Jacobian term) through the manual
    chunked ring allreduce (:func:`_ring_allreduce`) instead of XLA's
    monolithic psum/pmax — the form real ICI can pipeline with compute.
    Parity-tested vs psum on the virtual mesh (tests/test_edge_partition).
    """
    from pyhgt_tpu.ops.hgt import (
        _block_relation_transform,
        _rte_block_tables,
        typed_linear,
    )

    T, C, Din = x.shape
    Dout = wq.shape[-1]
    H, dk = n_heads, Dout // n_heads
    N = T * C

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
    else:
        k_tab = jnp.zeros((1, Dout), dtype=x.dtype)
        v_tab = jnp.zeros((1, Dout), dtype=x.dtype)

    pri_e = pe_local.rel_onehot @ rel_pri
    aggr_p = _edge_stage_local(
        q.reshape(N, Dout), k_rel, v_rel, k_tab, v_tab, pri_e,
        (H, dk, use_rte, axis_name, overlap),
        pe_local.edge_tgt, pe_local.gidx,
        pe_local.tabidx if use_rte else jnp.zeros_like(pe_local.tabidx),
        pe_local.mask_f,
        pe_local.seg_ptr_tgt, pe_local.perm_src, pe_local.seg_ptr_src,
        pe_local.perm_tab, pe_local.seg_ptr_tab,
    )
    if overlap:
        aggr = _ring_allreduce(aggr_p, axis_name, "sum")
    else:
        aggr = jax.lax.psum(aggr_p, axis_name)
    return aggr.reshape(T, C, Dout).astype(x.dtype)
