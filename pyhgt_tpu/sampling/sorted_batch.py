"""Target-sorted edge view — the scatter-free device layout.

TPU scatter with duplicate indices serializes (~50 ns/edge measured on
v5e), so the conv's segment ops must not lower to scatter. This module
precomputes, on host at batch-build time, everything the device needs to
run the whole edge stage with only gathers, matmuls and (segmented) scans:

- edges permuted so ``edge_tgt`` is globally non-decreasing (padding last),
  with ``seg_ptr_tgt[n] .. seg_ptr_tgt[n+1]`` delimiting node n's incoming
  edges — a CSR indptr over the flat node space;
- ``gidx`` (index into the per-block relation-transformed node banks) and
  ``tabidx`` (index into the per-(block, Δt) RTE tables), both permuted;
- ``rel_onehot [E, R]``: relation membership as f32, so the relation-prior
  gather AND its gradient are MXU matmuls rather than scatters;
- a second permutation ``perm_src`` (+ ``seg_ptr_src``) sorting edges by
  ``gidx``, used by the custom backward pass to turn the K/V gather
  transpose into a sorted segment sum; likewise ``perm_tab`` /
  ``seg_ptr_tab`` for the RTE tables.

The reference has no analogue: PyG scatters on GPU where atomics are
cheap (``/root/reference/pyHGT/conv.py:13,108``). This layout is the
TPU-native answer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from flax import struct

from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.pallas_seg import PK as _DEF_PK, PW as _DEF_PW, PallasSegAux
from pyhgt_tpu.ops.pallas_seg import PK, PW  # re-export (default tile sizes)
from pyhgt_tpu.ops.rte import RTE_MAX_LEN
from pyhgt_tpu.sampling.batch import BatchLayout, SubgraphBatch


@struct.dataclass
class SortedEdges:
    """Device arrays for the scatter-free edge stage (all [E] unless noted).

    The ``tl_* / live_* / seg_ptr2_*`` families drive the hierarchical
    tiled segment reductions (:func:`pyhgt_tpu.ops.sorted_hgt.
    seg_sum_tiled`): per-128-edge tile, ``tl`` is each edge's local
    segment rank, ``live_idx`` lists the ≤ S+E/128 live (tile, rank)
    partial rows in segment order, ``live_last`` the flat index of each
    live row's last edge, ``live_key`` its segment id, and ``seg_ptr2``
    the second-level CSR over live rows.
    """

    edge_src: np.ndarray      # flat source node index, tgt-sorted order
    edge_tgt: np.ndarray
    edge_dt: np.ndarray
    edge_mask: np.ndarray     # bool
    gidx: np.ndarray          # into [B*C] relation-transformed node banks
    tabidx: np.ndarray        # into [B*L] RTE tables
    rel_onehot: np.ndarray    # [E, R] f32
    seg_ptr_tgt: np.ndarray   # [N+1]
    perm_src: np.ndarray      # [E] permutation: tgt-order -> gidx-sorted
    seg_ptr_src: np.ndarray   # [B*C+1]
    perm_tab: np.ndarray      # [E] permutation: tgt-order -> tabidx-sorted
    seg_ptr_tab: np.ndarray   # [B*L+1]
    # composed node indices: edge_tgt[perm_*], so the backward can gather
    # q/g_aggr rows *natively in each sorted order* instead of permuting
    # [E, D] edge tensors (round-2 restructure, see ops/sorted_hgt.py)
    tgt_src_order: np.ndarray  # [E] = edge_tgt[perm_src]
    tgt_tab_order: np.ndarray  # [E] = edge_tgt[perm_tab]
    # tiled-reduction aux (tgt grouping, natural order)
    tl_tgt: np.ndarray        # [E]
    live_idx_tgt: np.ndarray  # [Mt]
    live_key_tgt: np.ndarray  # [Mt]
    live_last_tgt: np.ndarray # [Mt]
    seg_ptr2_tgt: np.ndarray  # [N+1]
    # tiled-reduction aux (gidx grouping, perm_src order)
    tl_src: np.ndarray        # [E]
    live_idx_src: np.ndarray  # [Ms]
    seg_ptr2_src: np.ndarray  # [G+1]
    # tiled-reduction aux (tabidx grouping, perm_tab order)
    tl_tab: np.ndarray        # [E]
    live_idx_tab: np.ndarray  # [Mtab]
    seg_ptr2_tab: np.ndarray  # [Gt+1]
    # Pallas kernel aux (ops/pallas_seg.py), one per grouping; None when
    # built with build_pallas_aux=False
    pseg_tgt: Optional[PallasSegAux] = None
    pseg_src: Optional[PallasSegAux] = None
    pseg_tab: Optional[PallasSegAux] = None
    # tab-window aux: reduces the tab grouping on SRC-ordered data (no
    # [E, D] tab permutes in the backward); None when a tile spans >2
    # meta-blocks (tiny layouts) — callers fall back to pseg_tab
    ptab_src: Optional[PallasSegAux] = None
    # singleton-split src aux (src_rank_cap): multi-edge segments through
    # a rank-capped kernel, degree-1 segments via a pure gather —
    # see pallas_seg_aux_split. None when the caps don't hold.
    pseg_src_multi: Optional[PallasSegAux] = None
    src_single_edges: Optional[np.ndarray] = None   # [cap] src-order idx
    src_single_inv: Optional[np.ndarray] = None     # [G] -> row in G/zero
    # tab compaction (tab_cap, round-4): tabidx and every tab aux are
    # remapped to per-block *occupied-Δt ranks* (bench: 60 distinct Δt of
    # 240 possible), shrinking the tab kernels' one-hot from W+L=480 to
    # ~2*cap and the RTE table space from B*L to B*cap. ``tab_sel``
    # gathers the compact table rows out of the full [B*L, D] device
    # build (ops/sorted_hgt.hgt_conv_core_sorted). None = uncompacted.
    tab_sel: Optional[np.ndarray] = None
    # two-region src reduction (src_split_cap, round-4): the src-sorted
    # edge array splits at the STATIC meta/self block boundary (self
    # blocks sort last and are singleton-dominated — one self edge per
    # node, /root/reference/pyHGT/data.py:241-243's self loops). Region 1
    # (meta blocks) runs the rank-capped kernel (one-hot 2*cap wide);
    # region 2 (the small self tail) needs NO kernel — a plain
    # cumsum-diff CSR over its rows. Replaces the round-3 singleton
    # split's random bypass gathers with a contiguous slice.
    pseg_src_lo: Optional[PallasSegAux] = None      # region-1 capped aux
    src_tail_ptr2: Optional[np.ndarray] = None      # [G - S1 + 1]
    src_cut: int = struct.field(pytree_node=False, default=0)
    src_s1: int = struct.field(pytree_node=False, default=0)


REDUCE_TILE = 128


def pallas_seg_aux(key_sorted: np.ndarray, num_segments: int,
                   K: int = PK, W: int = PW,
                   v: int = 0) -> Optional[PallasSegAux]:
    """Host aux for the Pallas segment-sum kernel over one grouping.

    ``key_sorted [E]`` non-decreasing (sentinel ``num_segments`` for
    padded edges, which therefore land in trailing live rows that
    ``ptr2`` never selects).  All output shapes are static functions of
    (E, num_segments, K, W) so the device program traces once per layout.

    ``v`` is the rank cap (straddle capacity): the kernel's one-hot /
    accumulator width is ``W + (v or K)``, so a measured bound on live
    rows per tile lets ``W = v << K`` and cuts the kernel's MXU FLOPs by
    ``(K+W)/(W+v)`` (round-3). The hard requirement for the monotone
    output-block contract is only ``W >= max live rows per tile``;
    returns ``None`` when a batch violates the cap (caller falls back to
    the legacy ``W = K`` aux — a one-off retrace, not an error).
    """
    E = key_sorted.shape[0]
    assert E % K == 0, f"edge count {E} not a multiple of the {K} tile"
    assert W >= (v or K), "W >= V keeps output-block steps <= 1"
    tiles = E // K
    k2 = key_sorted.reshape(tiles, K)
    new = np.ones((tiles, K), dtype=bool)
    new[:, 1:] = k2[:, 1:] != k2[:, :-1]
    rank = (np.cumsum(new, axis=1) - 1).astype(np.int64)
    n_live = rank[:, -1] + 1
    if v and int(n_live.max()) > v:
        return None  # cap violated: caller rebuilds with the legacy width
    live_off = np.concatenate([[0], np.cumsum(n_live)])       # [tiles+1]
    loc = ((live_off[:-1] % W)[:, None] + rank).astype(np.int32)
    blk = (live_off[:-1] // W).astype(np.int32)               # [tiles]
    # static block-count bound: live rows <= num_segments + tiles; one
    # extra block so the trailing flush never zero-clobbers real content
    NB = (num_segments + tiles + W - 1) // W + 1
    tail = np.minimum(blk[-1] + 1 + np.arange(NB - 1), NB - 1)
    blk_ext = np.concatenate([blk, tail]).astype(np.int32)
    pos = np.flatnonzero(new.reshape(E))      # first edge of each live row
    live_key = key_sorted[pos]
    ptr2 = np.searchsorted(live_key, np.arange(num_segments + 1)).astype(
        np.int32
    )
    # out row j == global live index j (blk*W + loc == live_off + rank),
    # so the per-row segment key is the live list padded with sentinel
    live_key_ext = np.full(NB * W, num_segments, dtype=np.int32)
    live_key_ext[: len(pos)] = live_key
    return PallasSegAux(loc=loc, blk=blk_ext, ptr2=ptr2,
                        live_key=live_key_ext, w=W, v=v)


def pallas_seg_aux_split(key_sorted: np.ndarray, num_segments: int,
                         K: int = PK, W: int = PW, v: int = 0,
                         single_cap: int = 0):
    """Singleton-split aux: degree-1 segments bypass the kernel.

    In the SRC grouping, runs of degree-1 sources make per-tile distinct
    counts reach K (no rank cap possible on the full space) — but a
    singleton segment's "sum" is just its one edge row. This builder
    numbers ranks over MULTI-edge segments only (singleton edges get the
    dead column loc = -1, matching no one-hot column) and returns the
    singleton routing for a pure-gather combine:

        bank = seg_sum_csr(kernel_partials, ptr2) + G_ext[single_inv]
        where G = data_in_grouping_order[single_edges]  (+ a zero row)

    Returns ``(aux, single_edges [single_cap], single_inv [S])`` or
    ``None`` when the multi-rank cap ``v`` or ``single_cap`` is violated
    (caller falls back to the legacy aux — a retrace, not an error).
    Measured at bench scale: src singletons are 5.9% of edges and
    multi-only distinct/tile maxes at 57 (vs 384 with singletons), so
    v = 64 narrows the src pair kernels' one-hot 768 -> 128 (round-3,
    docs/PERF_NOTES.md)."""
    E = key_sorted.shape[0]
    assert E % K == 0, f"edge count {E} not a multiple of the {K} tile"
    assert v and single_cap, "split aux needs both caps"
    assert W >= v, "W >= V keeps output-block steps <= 1"
    tiles = E // K
    key = np.asarray(key_sorted)
    new = np.ones(E, dtype=bool)
    new[1:] = key[1:] != key[:-1]
    seg_start = np.flatnonzero(new)
    seg_len = np.diff(np.append(seg_start, E))
    is_single_seg = seg_len == 1
    seg_of_edge = np.cumsum(new) - 1
    single_edge = is_single_seg[seg_of_edge]          # [E] bool
    n_single = int(is_single_seg.sum())
    if n_single > single_cap:
        return None

    # multi-only ranks per tile
    new2 = new.reshape(tiles, K).copy()
    new2[:, 0] = True  # a segment continuing across a tile gets a new rank
    multi_new = new2 & ~single_edge.reshape(tiles, K)
    rank = np.cumsum(multi_new, axis=1) - 1           # [tiles, K]
    n_live = multi_new.sum(axis=1)
    if int(n_live.max()) > v:
        return None
    live_off = np.concatenate([[0], np.cumsum(n_live)])
    loc = ((live_off[:-1] % W)[:, None] + rank).astype(np.int32)
    loc[~multi_new & ~np.cumsum(multi_new, axis=1).astype(bool)] = -1
    # ^ rows before the tile's first multi segment have rank -1 already
    loc[single_edge.reshape(tiles, K)] = -1           # dead column
    blk = (live_off[:-1] // W).astype(np.int32)
    NB = (num_segments + tiles + W - 1) // W + 1
    tail = np.minimum(blk[-1] + 1 + np.arange(NB - 1), NB - 1)
    blk_ext = np.concatenate([blk, tail]).astype(np.int32)

    pos = np.flatnonzero(multi_new.reshape(E))        # first edge per live row
    live_key = key[pos]
    ptr2 = np.searchsorted(live_key, np.arange(num_segments + 1)).astype(
        np.int32
    )
    live_key_ext = np.full(NB * W, num_segments, dtype=np.int32)
    live_key_ext[: len(pos)] = live_key
    aux = PallasSegAux(loc=loc, blk=blk_ext, ptr2=ptr2,
                       live_key=live_key_ext, w=W, v=v)

    single_edges = np.zeros(single_cap, np.int32)
    se_idx = seg_start[is_single_seg]                 # the segment's one edge
    single_edges[:n_single] = se_idx
    single_inv = np.full(num_segments, single_cap, np.int32)  # -> zero row
    single_rows = key[se_idx]
    positions = np.arange(n_single)
    keep = single_rows < num_segments                 # drop padding sentinel
    single_inv[single_rows[keep]] = positions[keep].astype(np.int32)
    return aux, single_edges, single_inv


def pallas_tab_window_aux(
    tab_src_order: np.ndarray, num_blocks: int,
    L: int = RTE_MAX_LEN, K: int = PK, W: int = PW,
):
    """Aux that reduces the TAB grouping directly on SRC-ORDERED data.

    In src order (sorted by ``gidx = block*C + src``) the meta-block is
    contiguous, so ``tabidx = block*L + Δt`` has a bounded window per
    tile: ``loc = (block - tile_block)*W + Δt ∈ [0, W + L) ⊂ [0, K + W)``.
    The standard live-partials kernel then accumulates per-(block, Δt)
    sums with its usual 2W carry — and the backward never permutes the
    [E, D] tensors into tab order (the two tab permutes per layer were
    ~6.6 ms at bench scale, docs/PERF_NOTES.md round-2 second wave).

    Output row ``b*W + Δt`` holds the sum for tab row ``b*L + Δt``;
    ``ptr2[s] = (s//L)*W + s%L`` lets the plain cumsum-diff combine
    (:func:`pyhgt_tpu.ops.sorted_hgt.seg_sum_csr`) pick them out.

    Returns None (caller falls back to the permute path) when any tile
    spans >2 blocks or a block is empty — only possible when per-meta
    edge blocks are smaller than the K=512 tile (tiny test layouts).
    """
    assert W >= L, (W, L)
    E = tab_src_order.shape[0]
    assert E % K == 0, f"edge count {E} not a multiple of the {K} tile"
    tiles = E // K
    block = (tab_src_order // L).astype(np.int64).reshape(tiles, K)
    delta = (tab_src_order % L).astype(np.int64).reshape(tiles, K)
    blk = block[:, 0].astype(np.int32)
    if (
        blk[0] != 0
        or np.any(block.max(axis=1) - blk > 1)
        or np.any(np.diff(blk) < 0)
        or np.any(np.diff(blk) > 1)
    ):
        return None
    loc = ((block - blk[:, None]) * W + delta).astype(np.int32)
    NB = num_blocks
    tail = np.minimum(blk[-1] + 1 + np.arange(NB - 1), NB - 1)
    blk_ext = np.concatenate([blk, tail]).astype(np.int32)
    s = np.arange(num_blocks * L + 1)
    ptr2 = ((s // L) * W + s % L).astype(np.int32)
    # straddle is bounded by the table length: loc ∈ [0, W + L), so the
    # kernel one-hot narrows from W+K to W+L (e.g. 768 -> 624 at K=384)
    return PallasSegAux(loc=loc, blk=blk_ext, ptr2=ptr2, w=W, v=L)


def _compact_tab(tabidx: np.ndarray, key_tab_sorted: np.ndarray,
                 B: int, L: int, cap: int):
    """Per-block occupied-Δt compaction of the RTE table space.

    The RTE table index ``tabidx = block*L + Δt`` spans B*L rows, but real
    graphs occupy few Δt slots per block (bench: max 59 of 240 — papers
    cluster in years; ``/root/reference/pyHGT/data.py:250`` caps the span
    at 120 either way). Remapping Δt to its *rank among the block's
    occupied slots* shrinks the tab grouping's segment space to B*cap,
    which narrows the tab-window kernels' one-hot from W+L to ~2*cap and
    the per-edge table gathers to a B*cap-row table.

    Returns ``(tabidx_c, key_c, tab_sel)`` — the remapped edge index, the
    remapped (still sorted: the map is monotone) tab-grouping sort key,
    and the [B*cap] original row per compact row (dead compact slots point
    at their block's last original slot; no edge maps there, so forward
    rows are never gathered and backward scatter adds zeros) — or
    ``(None, None, None)`` when a block occupies more than ``cap`` slots
    (caller keeps the uncompacted aux; a retrace, not an error).
    """
    used = np.zeros(B * L, dtype=bool)
    used[tabidx] = True
    u2 = used.reshape(B, L)
    occ = u2.sum(axis=1)
    if int(occ.max(initial=0)) > cap:
        return None, None, None
    rank = np.cumsum(u2, axis=1) - 1                      # [B, L]
    slot_rank = np.where(u2, rank, 0).reshape(B * L)
    comp_of = (np.arange(B * L) // L * cap + slot_rank).astype(np.int32)
    tabidx_c = comp_of[tabidx]
    key_c = comp_of[np.asarray(key_tab_sorted, np.int64)]
    tab_sel = np.empty(B * cap, np.int32)
    for b in range(B):
        rows = np.flatnonzero(u2[b])
        tab_sel[b * cap: b * cap + len(rows)] = b * L + rows
        tab_sel[b * cap + len(rows): (b + 1) * cap] = b * L + (L - 1)
    return tabidx_c, key_c.astype(np.int64), tab_sel


def _src_split_aux(key_src_sorted: np.ndarray, cut: int, s1: int,
                   seg_ptr_src: np.ndarray, G: int, K: int, cap: int):
    """Region auxes for the two-region src reduction.

    ``cut`` (edge index) / ``s1`` (segment index) mark the static
    meta/self boundary in src order: every edge < cut must carry a key
    < s1 and every edge >= cut a key >= s1 (the masked-edge convention
    makes per-block counts static, so this holds whenever the layout's
    meta capacities are tile-aligned). Returns ``(aux_lo, tail_ptr2)`` or
    ``(None, None)`` when the boundary or the region-1 rank cap doesn't
    hold (caller falls back to the single-call kernel).
    """
    key = np.asarray(key_src_sorted, np.int64)
    E = key.shape[0]
    if not (0 < cut < E) or cut % K:
        return None, None
    if key[cut - 1] >= s1 or key[cut] < s1:
        return None, None
    # W = 2*cap halves the output-block count vs W = cap (the v1 choice,
    # which measured +2.8 ms at bench scale): one-hot width 3*cap instead
    # of 2*cap but ~half the grid's flush steps and retire copies. v2 is
    # parity-tested but UNMEASURED on chip (the worker-state poisoning
    # blocked the 26880-shape family, PERF_NOTES round-4).
    aux_lo = pallas_seg_aux(key[:cut], s1, K, 2 * cap, v=cap)
    if aux_lo is None:
        return None, None
    tail_ptr2 = (np.asarray(seg_ptr_src[s1:], np.int64) - cut).astype(
        np.int32
    )
    return aux_lo, tail_ptr2


def _tiled_aux(key_sorted: np.ndarray, num_segments: int, K: int = REDUCE_TILE):
    """Host aux for the hierarchical tiled reduction over one grouping.

    ``key_sorted [E]``: non-decreasing segment ids (sentinel
    ``num_segments`` for padding). Returns (tile_local [E], live_idx [M],
    live_key [M], live_last [M], seg_ptr2 [S+1]) with static
    M = num_segments + E//K (padded live rows point at the extra zero row
    ``E//K * K`` appended by the device op).
    """
    E = key_sorted.shape[0]
    assert E % K == 0, f"edge count {E} not a multiple of the {K} tile"
    tiles = E // K
    k2 = key_sorted.reshape(tiles, K)
    new = np.ones((tiles, K), dtype=bool)
    new[:, 1:] = k2[:, 1:] != k2[:, :-1]
    rank = np.cumsum(new, axis=1) - 1
    tl = rank.reshape(E).astype(np.int32)

    pos = np.flatnonzero(new.reshape(E))          # first edge of each live row
    t_of = pos // K
    row = (t_of * K + tl[pos]).astype(np.int32)
    k_of = key_sorted[pos].astype(np.int32)
    last = (np.r_[pos[1:], E] - 1).astype(np.int32)

    M = num_segments + tiles
    L = len(pos)
    assert L <= M, (L, M)
    live_idx = np.full(M, tiles * K, dtype=np.int32)     # extra zero row
    live_key = np.full(M, num_segments, dtype=np.int32)  # sentinel
    live_last = np.full(M, E, dtype=np.int32)            # extra NEG row
    live_idx[:L] = row
    live_key[:L] = k_of
    live_last[:L] = last
    seg_ptr2 = np.searchsorted(live_key, np.arange(num_segments + 1)).astype(
        np.int32
    )
    return tl, live_idx, live_key, live_last, seg_ptr2


def sort_batch(
    batch: SubgraphBatch,
    layout: BatchLayout,
    em: Optional[EdgeStaticMeta] = None,
    num_relations: Optional[int] = None,
    build_pallas_aux: bool = True,
    native: Optional[bool] = None,
    pk: Optional[int] = None,
    pw: Optional[int] = None,
    tgt_rank_cap: int = 0,
    src_rank_cap: int = 0,
    tab_cap: int = 0,
    src_split_cap: int = 0,
) -> SortedEdges:
    return sort_edges(
        batch.edge_src, batch.edge_tgt, batch.edge_dt, batch.edge_mask,
        layout, em, num_relations, build_pallas_aux, native, pk, pw,
        tgt_rank_cap, src_rank_cap, tab_cap, src_split_cap,
    )


_NATIVE_OK: Optional[bool] = None


def _native_batch():
    """The C++ batch-prep module, or None if its library can't build.
    Probed once; numpy stays the always-available reference semantics."""
    global _NATIVE_OK
    if _NATIVE_OK is None:
        from pyhgt_tpu.sampling import native_batch

        _NATIVE_OK = native_batch.native_available()
    if _NATIVE_OK:
        from pyhgt_tpu.sampling import native_batch

        return native_batch
    return None


def sort_edges(
    edge_src,
    edge_tgt,
    edge_dt,
    edge_mask,
    layout: BatchLayout,
    em: Optional[EdgeStaticMeta] = None,
    num_relations: Optional[int] = None,
    build_pallas_aux: bool = True,
    native: Optional[bool] = None,
    pk: Optional[int] = None,
    pw: Optional[int] = None,
    tgt_rank_cap: int = 0,
    src_rank_cap: int = 0,
    tab_cap: int = 0,
    src_split_cap: int = 0,
) -> SortedEdges:
    """Edge-arrays-only entry: callers holding flat edge arrays (e.g. the
    evaluator's forward wrapper) need not fabricate a full SubgraphBatch.

    ``native=None`` auto-selects the C++ batch-prep core
    (native/sortbatch.cpp: stable counting sorts + one-pass aux builders,
    ~7x over the numpy path at bench scale) when its library builds;
    ``False`` forces the numpy reference semantics (outputs are
    bit-identical either way — tests/test_sorted_batch_native.py).

    ``pk``/``pw`` override the Pallas kernel tile / output-block sizes
    (default: module constants ``ops.pallas_seg.PK/PW``; both must be
    multiples of ``REDUCE_TILE`` and >= RTE_MAX_LEN for the tab window)."""
    PK = pk or _DEF_PK
    PW = pw or (pk or _DEF_PW)
    assert PK % REDUCE_TILE == 0, (PK, REDUCE_TILE)
    nb = _native_batch() if native in (None, True) else None
    if native is True and nb is None:
        raise RuntimeError("native batch prep requested but unavailable")
    em = em or EdgeStaticMeta.from_layout(layout)
    T, C = layout.num_types, layout.node_cap
    N = T * C
    E = layout.num_edges
    B = len(layout.blocks)
    L = RTE_MAX_LEN
    R = num_relations or (layout.schema.num_relations)

    src0 = src = np.asarray(edge_src)
    tgt = np.asarray(edge_tgt)
    dt0 = dt = np.asarray(edge_dt)
    mask = np.asarray(edge_mask)

    key = np.where(mask, tgt, N).astype(np.int32)  # padding sorts last
    # (the masked-edge indexing convention below: masked edges keep their
    # OWN meta-block's last slot instead of a global sentinel, so
    # src/tab-order block boundaries equal the static per-block
    # capacities, making every src-order aux — incl. the tab-window aux —
    # layout-static; required for dp stacking and the tab-window kernel's
    # tile/block alignment. The extra zero-valued rows land in (b, C-1) /
    # (b, L-1) segments: sums unchanged.)
    if nb is not None:
        # one C++ pass: target counting sort, then fused permute + masked
        # gidx/tabidx + [E, R] one-hot + PK padding. seg_ptr from the
        # unpadded sort is identical: padded edges all carry sentinel N
        # and sort last.
        perm, seg_ptr_tgt = nb.counting_sort(key, N)
        padn = (-E) % PK
        (src, safe_tgt_n, dt, mask, key, gidx, tabidx, onehot
         ) = nb.permute_build(
            src0, tgt, dt0, mask, perm, em.edge_block, em.gather_off,
            em.edge_rel, E + padn, C=C, L=L, R=R, N=N, B=B,
        )
        E = E + padn
        perm_src, seg_ptr_src = nb.counting_sort(gidx, B * C)
        key_src_sorted = gidx[perm_src].astype(np.int64)
        perm_tab, seg_ptr_tab = nb.counting_sort(tabidx, B * L)
        key_tab_sorted = tabidx[perm_tab].astype(np.int64)
    else:
        safe_tgt_n = None
        perm = np.argsort(key, kind="stable")
        src, tgt, dt, mask, key = (
            src[perm], tgt[perm], dt[perm], mask[perm], key[perm])
        blk_e = em.edge_block[perm]
        gidx = (src0 + em.gather_off)[perm]
        gidx = np.where(mask, gidx, blk_e * C + (C - 1)).astype(np.int32)
        tabidx = (em.edge_block * L + dt0)[perm]
        tabidx = np.where(mask, tabidx, blk_e * L + (L - 1)).astype(np.int32)
        rel = em.edge_rel[perm]
        onehot = np.zeros((E, R), dtype=np.float32)
        onehot[np.arange(E), rel] = mask  # padded rows are all-zero

        # pad the flat edge axis to the larger (Pallas) reduction tile
        # (extra edges are masked and sort last, so every downstream
        # pointer stays correct; PK is a multiple of REDUCE_TILE)
        padn = (-E) % PK
        if padn:
            src = np.concatenate([src, np.zeros(padn, src.dtype)])
            tgt = np.concatenate([tgt, np.zeros(padn, tgt.dtype)])
            dt = np.concatenate([dt, np.zeros(padn, dt.dtype)])
            mask = np.concatenate([mask, np.zeros(padn, bool)])
            key = np.concatenate([key, np.full(padn, N, key.dtype)])
            gidx = np.concatenate(
                [gidx, np.full(padn, B * C - 1, gidx.dtype)]
            )
            tabidx = np.concatenate(
                [tabidx, np.full(padn, B * L - 1, tabidx.dtype)]
            )
            onehot = np.concatenate([onehot, np.zeros((padn, R), np.float32)])
            E = E + padn

    if safe_tgt_n is not None:
        safe_tgt = safe_tgt_n
    else:
        safe_tgt = np.where(mask, tgt, N - 1).astype(np.int32)
    src_cut = src_s1 = 0
    if src_split_cap:
        # static meta/self boundary in src order (per-block counts are
        # static by the masked-edge convention; self blocks come last in
        # GraphSchema.build_blocks). Valid only when the meta capacities
        # happen to be tile-aligned — _src_split_aux re-verifies.
        n_meta = sum(1 for b in layout.blocks if b.meta.rel != "self")
        src_cut = sum(
            b.cap for b in layout.blocks if b.meta.rel != "self"
        )
        src_s1 = n_meta * C
    return _pack_sorted(
        src.astype(np.int32), safe_tgt, dt.astype(np.int32), mask, key,
        gidx, tabidx, onehot, N=N, B=B, C=C, L=L, nb=nb,
        seg_ptr_tgt=seg_ptr_tgt if nb is not None else None,
        perms=(perm_src, seg_ptr_src, perm_tab, seg_ptr_tab)
        if nb is not None else None,
        pk=PK, pw=PW, build_pallas_aux=build_pallas_aux,
        tgt_rank_cap=tgt_rank_cap, src_rank_cap=src_rank_cap,
        tab_cap=tab_cap, src_cut=src_cut, src_s1=src_s1,
        src_split_cap=src_split_cap,
    )


def _pack_sorted(src, safe_tgt, dt, mask, key, gidx, tabidx, onehot,
                 *, N, B, C, L, nb=None, seg_ptr_tgt=None, perms=None,
                 pk=None, pw=None, build_pallas_aux=True,
                 tgt_rank_cap: int = 0, src_rank_cap: int = 0,
                 tab_cap: int = 0, src_cut: int = 0, src_s1: int = 0,
                 src_split_cap: int = 0) -> SortedEdges:
    """Aux construction + SortedEdges packing for edge arrays that are
    ALREADY tgt-sorted (key non-decreasing) and padded to a ``pk``
    multiple. Shared by :func:`sort_edges` (the full batch) and
    :func:`pyhgt_tpu.parallel.edge_partition.partition_sorted` (each
    graph-axis shard is a sorted slice and gets the SAME production aux —
    tiled reductions, Pallas kernel aux, tab window — as a single-chip
    batch). ``seg_ptr_tgt``/``perms`` let callers that already computed
    the sorts (the native sort_edges path) skip recomputing them."""
    PK = pk or _DEF_PK
    PW = pw or (pk or _DEF_PW)
    E = key.shape[0]
    assert E % PK == 0, (E, PK)

    if perms is not None:
        perm_src, seg_ptr_src, perm_tab, seg_ptr_tab = perms
        key_src_sorted = gidx[perm_src]
        key_tab_sorted = tabidx[perm_tab]
    elif nb is not None:
        perm_src, seg_ptr_src = nb.counting_sort(gidx, B * C)
        key_src_sorted = gidx[perm_src]
        perm_tab, seg_ptr_tab = nb.counting_sort(tabidx, B * L)
        key_tab_sorted = tabidx[perm_tab]
    else:
        key_src = gidx.astype(np.int64)
        perm_src = np.argsort(key_src, kind="stable").astype(np.int32)
        key_src_sorted = key_src[perm_src]
        seg_ptr_src = np.searchsorted(
            key_src_sorted, np.arange(B * C + 1)
        ).astype(np.int32)
        key_tab = tabidx.astype(np.int64)
        perm_tab = np.argsort(key_tab, kind="stable").astype(np.int32)
        key_tab_sorted = key_tab[perm_tab]
        seg_ptr_tab = np.searchsorted(
            key_tab_sorted, np.arange(B * L + 1)
        ).astype(np.int32)
    if seg_ptr_tgt is None:
        seg_ptr_tgt = np.searchsorted(
            np.asarray(key, np.int64), np.arange(N + 1)
        ).astype(np.int32)

    # tab compaction: remap the tab grouping to per-block occupied-Δt
    # ranks BEFORE any tab aux is built. The remap is monotone, so
    # perm_tab / the sortedness of key_tab_sorted are preserved; only the
    # segment space (B*L -> B*Lt) and the keys change.
    tab_sel = None
    Lt = L
    if tab_cap and tab_cap % 8 == 0 and tab_cap < L:
        tabidx_c, key_c, tab_sel = _compact_tab(
            tabidx, key_tab_sorted, B, L, tab_cap
        )
        if tabidx_c is not None:
            tabidx = tabidx_c
            key_tab_sorted = key_c
            Lt = tab_cap
            seg_ptr_tab = np.searchsorted(
                key_tab_sorted, np.arange(B * Lt + 1)
            ).astype(np.int32)
        else:
            tab_sel = None

    if nb is not None:
        tl_tgt, li_tgt, lk_tgt, ll_tgt, sp2_tgt = nb.tiled_aux(
            key, N, REDUCE_TILE)
        tl_src, li_src, _lk, _ll, sp2_src = nb.tiled_aux(
            np.ascontiguousarray(key_src_sorted, np.int32), B * C,
            REDUCE_TILE)
        tl_tab, li_tab, _lk2, _ll2, sp2_tab = nb.tiled_aux(
            np.ascontiguousarray(key_tab_sorted, np.int32), B * Lt,
            REDUCE_TILE)
    else:
        tl_tgt, li_tgt, lk_tgt, ll_tgt, sp2_tgt = _tiled_aux(key, N)
        tl_src, li_src, _lk, _ll, sp2_src = _tiled_aux(key_src_sorted, B * C)
        tl_tab, li_tab, _lk2, _ll2, sp2_tab = _tiled_aux(key_tab_sorted, B * Lt)

    pseg_tgt = pseg_src = pseg_tab = ptab_src = None
    pseg_src_multi = src_single_edges = src_single_inv = None
    pseg_src_lo = src_tail_ptr2 = None
    if build_pallas_aux and src_split_cap and src_cut and src_s1:
        pseg_src_lo, src_tail_ptr2 = _src_split_aux(
            key_src_sorted, src_cut, src_s1, seg_ptr_src, B * C, PK,
            src_split_cap,
        )
    if pseg_src_lo is None:
        src_cut = src_s1 = 0
    if build_pallas_aux:
        if src_rank_cap:
            split = pallas_seg_aux_split(
                np.ascontiguousarray(key_src_sorted, np.int64),
                B * C, PK, src_rank_cap, v=src_rank_cap,
                single_cap=max(len(key) // 8, src_rank_cap),
            )
            if split is not None:
                pseg_src_multi, src_single_edges, src_single_inv = split
        if tgt_rank_cap:
            # rank-capped tgt aux (numpy builder; W = V = cap). None on a
            # cap violation -> legacy width below (one-off retrace).
            pseg_tgt = pallas_seg_aux(
                key.astype(np.int64), N, PK, tgt_rank_cap, v=tgt_rank_cap
            )
        if nb is not None:
            if pseg_tgt is None:
                pseg_tgt = nb.pallas_aux(key, N, PK, PW)
            pseg_src = nb.pallas_aux(
                np.ascontiguousarray(key_src_sorted, np.int32), B * C,
                PK, PW)
            pseg_tab = nb.pallas_aux(
                np.ascontiguousarray(key_tab_sorted, np.int32), B * Lt,
                PK, PW)
            # the window's only W constraint is W >= L (blocks are META
            # blocks, advance <= 1/tile regardless of W) — W = L minimizes
            # the kernel one-hot width to 2L (round-3); with tab
            # compaction L here is the compact slot count Lt
            W_tab = ((Lt + 7) // 8) * 8
            ptab_src = (nb.tab_window_aux(tabidx[perm_src], B, Lt, PK,
                                          W_tab) if PK >= Lt else None)
        else:
            if pseg_tgt is None:
                pseg_tgt = pallas_seg_aux(key.astype(np.int64), N, PK, PW)
            pseg_src = pallas_seg_aux(
                key_src_sorted.astype(np.int64), B * C, PK, PW)
            pseg_tab = pallas_seg_aux(
                key_tab_sorted.astype(np.int64), B * Lt, PK, PW)
            W_tab = ((Lt + 7) // 8) * 8
            ptab_src = (pallas_tab_window_aux(
                tabidx[perm_src], B, Lt, PK, W_tab) if PK >= Lt else None)

    return SortedEdges(
        edge_src=src.astype(np.int32),
        edge_tgt=safe_tgt,
        tgt_src_order=safe_tgt[perm_src],
        tgt_tab_order=safe_tgt[perm_tab],
        edge_dt=dt.astype(np.int32),
        edge_mask=mask,
        gidx=gidx,
        tabidx=tabidx,
        rel_onehot=onehot,
        seg_ptr_tgt=seg_ptr_tgt,
        perm_src=np.asarray(perm_src, np.int32),
        seg_ptr_src=np.asarray(seg_ptr_src, np.int32),
        perm_tab=np.asarray(perm_tab, np.int32),
        seg_ptr_tab=np.asarray(seg_ptr_tab, np.int32),
        tl_tgt=tl_tgt,
        live_idx_tgt=li_tgt,
        live_key_tgt=lk_tgt,
        live_last_tgt=ll_tgt,
        seg_ptr2_tgt=sp2_tgt,
        tl_src=tl_src,
        live_idx_src=li_src,
        seg_ptr2_src=sp2_src,
        tl_tab=tl_tab,
        live_idx_tab=li_tab,
        seg_ptr2_tab=sp2_tab,
        pseg_tgt=pseg_tgt,
        pseg_src=pseg_src,
        pseg_tab=pseg_tab,
        ptab_src=ptab_src,
        pseg_src_multi=pseg_src_multi,
        src_single_edges=src_single_edges,
        src_single_inv=src_single_inv,
        tab_sel=tab_sel,
        pseg_src_lo=pseg_src_lo,
        src_tail_ptr2=src_tail_ptr2,
        src_cut=src_cut,
        src_s1=src_s1,
    )
