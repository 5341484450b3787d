"""The fused HGT convolution core — per-meta-relation attention as one XLA program.

Reference algorithm (``/root/reference/pyHGT/conv.py:60-134``), per edge
(i = target, j = source) of meta-relation (tt, st, r), with heads H and
head dim dk:

    x_j'  = x_j + RTE(dt)                               (conv.py:91-92)
    q     = Q_lin[tt](x_i)                              (conv.py:96)
    k     = K_lin[st](x_j') @ relation_att[r]           (conv.py:97-98, per head)
    att   = <q, k> * relation_pri[r] / sqrt(dk)         (conv.py:99)
    m     = V_lin[st](x_j') @ relation_msg[r]           (conv.py:103-104)
    w     = segment_softmax(att, by target)             (conv.py:108)
    aggr_i = sum_j w * m                                (scatter-add)

The reference evaluates this with a Python triple loop over
(src_type × tgt_type × relation) and per-edge Linear calls — the throughput
killer (SURVEY.md §3.2). The TPU-native re-derivation here uses two
algebraic facts:

1. **Affinity of the projections.** ``K_lin(x_j + rte) = K_lin(x_j) +
   W_k·rte(dt)``.  So the K/V projections move from *edges* to *nodes*
   (one ``[T,C,Din]×[T,Din,Dout]`` batched matmul per projection), and the
   RTE contribution becomes a per-(block, dt) **lookup table** with only
   ``RTE_MAX_LEN=240`` rows (``dt`` is clipped into [0,240),
   ``pyHGT/data.py:247-250``).
2. **Static edge blocks.** The batch layout fixes one edge block per
   meta-relation (:class:`~pyhgt_tpu.graph.schema.EdgeBlockSpec`), so the
   relation transforms ``· relation_att[r]`` / ``· relation_msg[r]`` are
   applied at *node* granularity per block — one
   ``[B,C,H,dk]×[B,H,dk,dk]`` batched matmul — instead of gathering
   ``[E,H,dk,dk]`` relation matrices per edge.

What remains per-edge is exactly gather → multiply-reduce (SDDMM) →
segment-softmax → scatter-add (SpMM), which XLA fuses well; the
scatter-free production path lives in :mod:`pyhgt_tpu.ops.sorted_hgt`.

Everything here is functional: params in, arrays out; flax modules in
:mod:`pyhgt_tpu.models` own the parameters.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pyhgt_tpu.ops.rte import RTE_MAX_LEN
from pyhgt_tpu.ops.segment import segment_softmax, segment_sum


@dataclasses.dataclass(frozen=True)
class EdgeStaticMeta:
    """Compile-time per-edge/per-block metadata derived from a BatchLayout.

    All arrays are numpy (trace-time constants):
      block_rel   [B]  relation id of each edge block
      block_src   [B]  source node-type id of each block
      block_tgt   [B]  target node-type id of each block
      edge_block  [E]  block id of each flat edge slot
      edge_rel    [E]  relation id of each flat edge slot
      gather_off  [E]  block_id*C - src_type_id*C : turns a flat node index
                       (edge_src) into an index into the [B*C, ...] stacked
                       per-block node transforms
    """

    num_types: int
    node_cap: int
    block_rel: np.ndarray
    block_src: np.ndarray
    block_tgt: np.ndarray
    edge_block: np.ndarray
    edge_rel: np.ndarray
    gather_off: np.ndarray

    @classmethod
    def from_layout(cls, layout) -> "EdgeStaticMeta":
        blocks = layout.blocks
        C = layout.node_cap
        B = len(blocks)
        block_rel = np.array([b.rel_id for b in blocks], dtype=np.int32)
        block_src = np.array([b.src_type_id for b in blocks], dtype=np.int32)
        block_tgt = np.array([b.tgt_type_id for b in blocks], dtype=np.int32)
        E = layout.num_edges
        edge_block = np.zeros(E, dtype=np.int32)
        for bi, b in enumerate(blocks):
            edge_block[b.start : b.stop] = bi
        edge_rel = block_rel[edge_block]
        gather_off = (edge_block * C - block_src[edge_block] * C).astype(np.int32)
        return cls(
            num_types=layout.num_types,
            node_cap=C,
            block_rel=block_rel,
            block_src=block_src,
            block_tgt=block_tgt,
            edge_block=edge_block,
            edge_rel=edge_rel,
            gather_off=gather_off,
        )


# Backward of the per-block gathers in _block_relation_transform /
# _rte_block_tables: XLA lowers the gradient of a duplicate-index gather
# (block_src repeats per source type, block_rel per relation) to a
# serialized scatter-add while-loop — probe9 traced 8 such loops plus
# their slice/copy machinery at ~6 ms/step at bench scale. The indices
# are trace-time numpy constants, so the transpose is a tiny dense
# one-hot matmul instead ([B, T] @ [B, C, H, dk] — micro-FLOPs). The
# FORWARD HLO is unchanged: the gather tables' VMEM residency depends
# fragilely on the producer layout chain (docs/PERF_NOTES.md round-2
# folded-einsum lesson), so only the backward may be rewritten.
ONEHOT_BWD = False  # flip after the round-3 on-chip A/B


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _gather_static(table, idx, n_rows):
    return table[np.asarray(idx, np.int32)]


def _gather_static_fwd(table, idx, n_rows):
    return table[np.asarray(idx, np.int32)], None


def _gather_static_bwd(idx, n_rows, _res, g):
    b = len(idx)
    oh = np.zeros((b, n_rows), np.float32)
    oh[np.arange(b), np.asarray(idx)] = 1.0
    g_table = jnp.einsum(
        "br,b...->r...", jnp.asarray(oh), g.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return (g_table.astype(g.dtype),)


_gather_static.defvjp(_gather_static_fwd, _gather_static_bwd)


def _block_gather(table, idx):
    """``table[idx]`` for a static numpy ``idx`` with duplicate entries;
    scatter-free transpose when ONEHOT_BWD is on."""
    if not ONEHOT_BWD:
        return table[np.asarray(idx)]
    return _gather_static(
        table, tuple(int(i) for i in np.asarray(idx)), int(table.shape[0])
    )


def typed_linear(x, w, b=None):
    """Per-type affine map: x [T,C,Din] @ w [T,Din,Dout] (+ b [T,Dout]).

    One batched matmul on the MXU — replaces the reference's ``num_types``
    separate ``nn.Linear`` modules (``pyHGT/conv.py:28-40``); nodes are
    type-contiguous by batch-layout construction.
    """
    y = jnp.einsum("tcd,tde->tce", x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[:, None, :]
    return y.astype(x.dtype)


def _block_relation_transform(nodes_proj, wk_rel, em: EdgeStaticMeta):
    """Apply per-relation basis matrices at node granularity per edge block.

    nodes_proj [T, C, H, dk] -> gathered per block by source type ->
    einsum with wk_rel[block_rel] [B, H, dk, dk] -> [B, C, H, dk].
    """
    by_block = _block_gather(nodes_proj, em.block_src)   # [B, C, H, dk]
    mats = _block_gather(wk_rel, em.block_rel)           # [B, H, dk, dk]
    out = jnp.einsum(
        "bchk,bhkl->bchl", by_block, mats, preferred_element_type=jnp.float32
    )
    return out.astype(nodes_proj.dtype)


def _rte_block_tables(rte_vec, w_proj, wk_rel, em: EdgeStaticMeta, H, dk):
    """Per-(block, dt) additive K/V correction tables.

    rte_vec [L, Din] (already through the trainable RTE linear) projected by
    the *source-type* K/V weight then the block's relation basis:
    [B, L, H, dk]. L = RTE_MAX_LEN = 240.
    """
    # [T, L, Dout] — rte through each type's projection (no bias: the node
    # projection already carries it; affinity argument in module docstring).
    per_type = jnp.einsum(
        "ld,tde->tle", rte_vec, w_proj, preferred_element_type=jnp.float32
    )
    L = rte_vec.shape[0]
    per_type = per_type.reshape(per_type.shape[0], L, H, dk)
    by_block = _block_gather(per_type, em.block_src)     # [B, L, H, dk]
    mats = _block_gather(wk_rel, em.block_rel)           # [B, H, dk, dk]
    out = jnp.einsum(
        "blhk,bhkm->blhm", by_block, mats, preferred_element_type=jnp.float32
    )
    return out.astype(rte_vec.dtype)


def hgt_conv_core(
    x,                 # [T, C, Din] node features (type-contiguous, padded)
    edge_src,          # [E] flat source node index (type*C + local)
    edge_tgt,          # [E] flat target node index
    edge_dt,           # [E] int32 in [0, RTE_MAX_LEN)
    edge_mask,         # [E] bool
    em: EdgeStaticMeta,
    *,
    wq, bq,            # [T, Din, Dout], [T, Dout]
    wk, bk,
    wv, bv,
    rel_pri,           # [R, H]
    rel_att,           # [R, H, dk, dk]
    rel_msg,           # [R, H, dk, dk]
    n_heads: int,
    rte_vec=None,      # [L, Din] sin-table @ rte linear, or None (use_RTE off)
):
    """Attention + message aggregation (the reference's ``message`` +
    scatter, ``pyHGT/conv.py:60-111``). Returns aggr [T, C, Dout].

    The ``update`` half (gelu → a_linear → skip gate → norm,
    ``conv.py:114-134``) lives in the flax module — it is per-node dense
    math XLA fuses on its own.
    """
    T, C, Din = x.shape
    Dout = wq.shape[-1]
    H, dk = n_heads, Dout // n_heads
    N = T * C
    E = edge_src.shape[0]

    # --- node-level projections (MXU batched matmuls) ---
    q = typed_linear(x, wq, bq).reshape(T, C, H, dk)
    k = typed_linear(x, wk, bk).reshape(T, C, H, dk)
    v = typed_linear(x, wv, bv).reshape(T, C, H, dk)

    # --- per-block relation transforms at node granularity ---
    # NOTE on layouts: every per-edge tensor below stays flat [E, Dout]
    # (Dout = H*dk is lane-aligned); [E, H, dk] materializations would pad
    # dk=64 to the 128-lane tile and double HBM footprint. Head splits
    # happen only inside fused elementwise/reduce ops.
    k_rel = _block_relation_transform(k, rel_att, em)   # [B, C, H, dk]
    v_rel = _block_relation_transform(v, rel_msg, em)   # [B, C, H, dk]
    B = k_rel.shape[0]
    k_rel = k_rel.reshape(B * C, Dout)
    v_rel = v_rel.reshape(B * C, Dout)

    # --- per-edge gathers (the SDDMM inputs) ---
    gidx = edge_src + jnp.asarray(em.gather_off)        # index into [B*C, ...]
    k_e = k_rel[gidx]                                    # [E, Dout]
    v_e = v_rel[gidx]
    q_e = q.reshape(N, Dout)[edge_tgt]                   # [E, Dout]

    # --- RTE additive correction via the 240-row tables ---
    if rte_vec is not None:
        k_tab = _rte_block_tables(rte_vec, wk, rel_att, em, H, dk)  # [B,L,H,dk]
        v_tab = _rte_block_tables(rte_vec, wv, rel_msg, em, H, dk)
        L = rte_vec.shape[0]
        tab_idx = jnp.asarray(em.edge_block) * L + edge_dt
        k_e = k_e + k_tab.reshape(B * L, Dout)[tab_idx]
        v_e = v_e + v_tab.reshape(B * L, Dout)[tab_idx]

    # --- attention scores (SDDMM; fused multiply-reduce over dk) ---
    pri = rel_pri[jnp.asarray(em.edge_rel)]              # [E, H]
    att = jnp.sum(
        (q_e.astype(jnp.float32) * k_e.astype(jnp.float32)).reshape(E, H, dk),
        axis=-1,
    )
    att = att * pri.astype(jnp.float32) / jnp.sqrt(jnp.float32(dk))

    # --- segment softmax over incoming edges of each target node ---
    w = segment_softmax(att, edge_tgt, N, mask=edge_mask)  # [E, H]

    # --- weighted scatter-add (SpMM) ---
    msg = (
        w[:, :, None] * v_e.astype(jnp.float32).reshape(E, H, dk)
    ).reshape(E, Dout)
    aggr = segment_sum(msg, edge_tgt, N, mask=edge_mask)   # [N, Dout]
    return aggr.reshape(T, C, Dout).astype(x.dtype), w
