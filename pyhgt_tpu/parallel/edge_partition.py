"""Edge-partitioned HGT — the graph analogue of sequence/context parallelism.

The reference has no distributed execution at all (SURVEY.md §2.9); its
scaling lever is sampling smaller subgraphs. Here one *large* subgraph is
partitioned across a ``graph`` mesh axis:

- the target-sorted edge array splits into contiguous per-device slices,
  and EACH SLICE gets the full production aux (tiled-reduction +
  Pallas-kernel aux, src/tab permutations, tab window) via the same
  :func:`~pyhgt_tpu.sampling.sorted_batch._pack_sorted` the single-chip
  batch uses — so each shard runs the production scatter-free edge stage
  (Pallas live-partials kernels, bf16 edge stage, save_kv residuals),
  not a separate slower formulation (round-3: the old CSR-only
  partitioned core measured +109 ms/step at gp=1, docs/runs/
  gp_overhead_r3.json);
- node-level tensors (queries, relation-transformed K/V banks, RTE
  tables) are replicated along ``graph`` — they are O(N·D), edges are
  O(E·D), E >> N;
- softmax statistics cross shards with one ``pmax`` + one ``psum`` of
  ``[N, H]`` (the "boundary exchange" — it rides ICI), the partial
  ``[N, D]`` aggregations ``psum`` once per layer, and the backward
  adds one ``[N, H]`` ``psum`` for the softmax Jacobian term — all
  implemented INSIDE :mod:`pyhgt_tpu.ops.sorted_hgt` behind the
  ``axis_name`` knob (gated to identity on single-chip runs), optionally
  as chunked ppermute rings (``gp_overlap``);
- gradients of the replicated node tensors are psum'd by the shard_map
  transpose automatically.

Composes with data parallelism (outer stacking over the ``data`` axis).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from flax import struct

from pyhgt_tpu.ops.rte import RTE_MAX_LEN
from pyhgt_tpu.ops.sorted_hgt import (  # noqa: F401  (re-exports for tests)
    hgt_conv_core_sorted,
    ring_allreduce as _ring_allreduce,
)
from pyhgt_tpu.sampling.sorted_batch import SortedEdges, _pack_sorted

from pyhgt_tpu.parallel.mesh import GRAPH_AXIS  # single source of truth


@struct.dataclass
class PartitionedEdges:
    """Per-shard :class:`SortedEdges`, every leaf stacked on a leading
    [P] axis (shard_map over ``graph`` strips it to the local shard)."""

    se: SortedEdges


def partition_sorted(se: SortedEdges, n_parts: int, num_blocks: int,
                     node_cap: int, num_nodes_flat: int,
                     pk: Optional[int] = None,
                     pw: Optional[int] = None,
                     tgt_rank_cap: int = 0,
                     tab_cap: int = 0) -> PartitionedEdges:
    """Split a target-sorted edge view into ``n_parts`` contiguous slices,
    each packed with the FULL production aux (host-side, numpy/C++ —
    slices of a sorted array are sorted, so every per-shard builder is
    the single-chip one).

    ``tab_cap`` / ``tgt_rank_cap`` apply PER SHARD (round-5): each slice
    re-compacts its own occupied-(block, Δt) table space and builds its
    own rank-capped tgt aux inside :func:`_pack_sorted` — the same code
    path as the single-chip batch, so the multi-chip program runs the
    full production preset (the conv core's one-hot ``_tab_select`` then
    selects against each shard's own ``tab_sel``, inside shard_map). A
    shard's slice occupies a subset of the full batch's Δt slots, so a
    cap the single-chip batch satisfies is almost always satisfiable
    per shard; if ANY shard violates a cap the whole batch falls back
    for that cap (all-or-none — shards must stack homogeneously and run
    one program).
    """
    from pyhgt_tpu.ops.pallas_seg import PK as _PK, PW as _PW
    from pyhgt_tpu.sampling.sorted_batch import _native_batch

    PKv = pk or _PK
    PWv = pw or (pk or _PW)
    if getattr(se, "tab_sel", None) is not None or se.src_cut:
        raise ValueError(
            "partition_sorted needs an UNCOMPACTED SortedEdges: per-shard "
            "aux is rebuilt from se.tabidx assuming the full B*L tab space "
            "and unsplit src space — build the batch with tab_cap=0 / "
            "src_split_cap=0 when gp > 1 and pass tab_cap here instead "
            "(Flagship.sort and the engine producer do this automatically)"
        )
    E = se.edge_tgt.shape[0]
    if E % n_parts:
        raise ValueError(f"E={E} not divisible by n_parts={n_parts}")
    Ep = E // n_parts
    padn = (-Ep) % PKv
    N = num_nodes_flat
    B = num_blocks
    C = node_cap
    L = RTE_MAX_LEN
    R = se.rel_onehot.shape[-1]
    nb = _native_batch()

    sl = lambda a, p: np.asarray(a[p * Ep:(p + 1) * Ep])

    def pack(p, tab_cap_, rank_cap_):
        src = sl(se.edge_src, p)
        tgt = sl(se.edge_tgt, p)
        dt = sl(se.edge_dt, p)
        mask = sl(se.edge_mask, p)
        gidx = sl(se.gidx, p)
        tabidx = sl(se.tabidx, p)
        onehot = sl(se.rel_onehot, p)
        key = np.where(mask, tgt, N).astype(np.int32)
        if padn:
            # pad each shard to the kernel tile (sort_edges convention:
            # masked rows land in the last block's last slot)
            src = np.concatenate([src, np.zeros(padn, src.dtype)])
            tgt = np.concatenate([tgt, np.full(padn, N - 1, tgt.dtype)])
            dt = np.concatenate([dt, np.zeros(padn, dt.dtype)])
            mask = np.concatenate([mask, np.zeros(padn, bool)])
            gidx = np.concatenate(
                [gidx, np.full(padn, B * C - 1, gidx.dtype)])
            tabidx = np.concatenate(
                [tabidx, np.full(padn, B * L - 1, tabidx.dtype)])
            onehot = np.concatenate(
                [onehot, np.zeros((padn, R), onehot.dtype)])
            key = np.concatenate([key, np.full(padn, N, key.dtype)])
        return _pack_sorted(
            src.astype(np.int32), tgt.astype(np.int32),
            dt.astype(np.int32), mask, key,
            gidx.astype(np.int32), tabidx.astype(np.int32),
            np.ascontiguousarray(onehot, np.float32),
            N=N, B=B, C=C, L=L, nb=nb, pk=PKv, pw=PWv,
            tgt_rank_cap=rank_cap_, tab_cap=tab_cap_,
        )

    import jax

    def consistent(shards):
        """Homogeneous pytrees (a per-shard cap fallback changes the tree
        structure or an aux leaf's width) — required to stack and run one
        program across the mesh."""
        t0 = jax.tree.structure(shards[0])
        if any(jax.tree.structure(s) != t0 for s in shards[1:]):
            return False
        shp0 = [np.shape(leaf) for leaf in jax.tree.leaves(shards[0])]
        return all(
            [np.shape(leaf) for leaf in jax.tree.leaves(s)] == shp0
            for s in shards[1:]
        )

    # all-or-none cap fallback ladder, mirroring the single-chip
    # per-batch fallbacks (tab first: it is the cheaper rebuild)
    attempts = [(tab_cap, tgt_rank_cap)]
    if tab_cap:
        attempts.append((0, tgt_rank_cap))
    if tgt_rank_cap:
        attempts.append((tab_cap, 0))
    if tab_cap and tgt_rank_cap:
        attempts.append((0, 0))
    shards = None
    for tab_c, rank_c in attempts:
        cand = [pack(p, tab_c, rank_c) for p in range(n_parts)]
        if tab_c and not all(
            getattr(s, "tab_sel", None) is not None for s in cand
        ):
            # a shard fell back to the uncompacted table space — a
            # partially-compacted stack cannot run one program
            continue
        if consistent(cand):
            shards = cand
            break
    if shards is None:  # pragma: no cover - every-ladder-rung fallback
        raise ValueError(
            "partition_sorted: no homogeneous per-shard aux even with "
            "caps disabled — shard aux shapes diverge"
        )
    stacked = jax.tree.map(lambda *xs: np.stack(xs), *shards)
    return PartitionedEdges(se=stacked)


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
    save_kv: bool = False,
    edge_dtype=None,
    bwd_recompute: bool = False,
    bwd_src_direct: bool = False,
    bwd_slab: bool = False,
    seg_pallas: bool = False,
    softmax_pallas: bool = False,
    softmax_tilemax=False,
):
    """Edge-partitioned HGT attention — the PRODUCTION sorted core run on
    this shard's SortedEdges with cross-shard boundary exchanges
    (softmax stats + aggregation + backward Jacobian term). Must be
    called INSIDE a shard_map over ``axis_name``; returns the full
    (combined) aggregation [T, C, Dout]. All single-chip perf knobs
    (save_kv / bf16 edge stage / Pallas kernels / backward strategy)
    apply per shard.

    ``overlap=True`` routes every boundary exchange through the manual
    chunked ring allreduce (:func:`pyhgt_tpu.ops.sorted_hgt.
    ring_allreduce`) instead of XLA's monolithic psum/pmax — the form
    real ICI can pipeline. Parity-tested vs psum on the virtual mesh.
    """
    se_local = pe_local.se if isinstance(pe_local, PartitionedEdges) \
        else pe_local
    return hgt_conv_core_sorted(
        x, se_local, em,
        wq=wq, bq=bq, wk=wk, bk=bk, wv=wv, bv=bv,
        rel_pri=rel_pri, rel_att=rel_att, rel_msg=rel_msg,
        n_heads=n_heads, rte_vec=rte_vec,
        save_kv=save_kv, edge_dtype=edge_dtype,
        bwd_recompute=bwd_recompute, bwd_src_direct=bwd_src_direct,
        bwd_slab=bwd_slab, seg_pallas=seg_pallas,
        softmax_pallas=softmax_pallas, softmax_tilemax=softmax_tilemax,
        axis_name=axis_name, gp_overlap=overlap,
    )
