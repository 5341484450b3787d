"""Pallas TPU kernel for segment reductions over sorted edges.

Replaces level 1 of the hierarchical tiled segment sum
(:func:`pyhgt_tpu.ops.sorted_hgt.seg_sum_tiled`) — the TPU-native
equivalent of the scatter-add hidden in the reference's PyG
``MessagePassing(aggr='add')`` machinery (``/root/reference/pyHGT/
conv.py:13,108``).  The XLA formulation writes a full [E, D] partial
buffer, re-reads it through a gather, and runs its one-hot einsum at
128-row granularity; this kernel streams each 512-edge tile through VMEM
exactly once and emits only the *live* (tile, segment)-partial rows.

Design (constraints measured in experiments/pallas_probe*.py and
docs/PERF_NOTES.md):

- edges arrive sorted by segment key, so each tile's distinct segments
  get local ranks 0..n_live-1 and the global live-row index
  ``live_off[tile] + rank`` is non-decreasing with steps <= 1 — output
  blocks advance monotonically and a 2W-row VMEM accumulator carries
  partial rows across tile/block boundaries;
- per-tile partials are ONE one-hot [K, 2W] @ [K, D] MXU matmul
  (bf16 operands, f32 accumulation); Mosaic exposes no vectorized
  dynamic VMEM addressing, and one-hot over the *rank* space is dense
  and bounded (2W columns), unlike one-hot over raw segment ids;
- output block indices come from a scalar-prefetched per-step array
  (``PrefetchScalarGridSpec`` index_map), trailing grid steps flush the
  final carry and zero-fill the static tail;
- >= 512-edge tiles amortize the ~2-4 us/step grid overhead.

Level 2 (combining the <= S + E/K live rows per segment) stays in XLA —
:func:`pyhgt_tpu.ops.sorted_hgt.seg_sum_csr` over an ~S-row buffer is
bandwidth-trivial.

Host-side aux construction lives in
:func:`pyhgt_tpu.sampling.sorted_batch.pallas_seg_aux`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile (K) and output-block (W) sizes. W >= K guarantees the output block
# index advances by at most 1 per tile (see sorted_batch.pallas_seg_aux);
# the one-hot width is K + W, so the kernel's MXU FLOPs are
# 2·E·(K+W)·D and shrinking K/W cuts compute directly (the kernels run
# compute-bound at ~164 TFLOP/s, probe9). Round-3 on-chip sweep
# (docs/runs/ab_round3*.json): 384 = 155.2 -> 134.0 ms/step at bench
# scale; 256 and every asymmetric K < W config LOSE to per-tile fixed
# costs (one-hot build + small-matmul pipeline overhead). The tab-window
# aux needs K, W >= RTE_MAX_LEN = 240, so 256 is the hard floor.
PK = 384
PW = 384


@struct.dataclass
class PallasSegAux:
    """Host-precomputed per-grouping aux for :func:`live_partials`.

    ``loc [tiles, K]``: each edge's column in the one-hot — its global
    live-row index minus ``blk[tile] * W`` (in ``[0, K + W)``).
    ``blk [tiles + NB - 1]``: output block index per grid step; the
    trailing ``NB - 1`` sentinel steps flush the carry and zero the tail.
    ``ptr2 [S + 1]``: CSR over live rows per segment (level-2 combine).
    ``live_key [NB * W]``: segment id per output/live row (sentinel
    ``num_segments`` for dead rows) — drives the level-2 segmented max in
    :func:`segment_softmax_partials`'s combine.
    ``w``: the output-block row count W this aux was built for (static —
    part of the pytree structure, not a traced leaf).
    """

    loc: np.ndarray
    blk: np.ndarray
    ptr2: np.ndarray
    live_key: Optional[np.ndarray] = None
    w: int = struct.field(pytree_node=False, default=512)
    # straddle capacity V = max live rows any tile adds (0 = legacy: V=K).
    # The one-hot/accumulator width is W + V: a host-measured rank cap
    # (e.g. 64 for the tgt grouping at bench scale, vs K=384) cuts the
    # kernel's MXU FLOPs by (K+W)/(W+V) (round-3; see PERF_NOTES).
    v: int = struct.field(pytree_node=False, default=0)


def _seg_kernel(K, W, V, n_tiles, split_hi_lo, blk_ref, loc_ref, data_ref,
                out_ref, acc_ref):
    t = pl.program_id(0)
    cur = blk_ref[t]
    prev = blk_ref[jnp.maximum(t - 1, 0)]

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(t > 0, cur != prev))
    def _():
        # entered a new output block: previous block's rows retire, the
        # V straddling rows (local offset >= W) become the new block's
        # head (V <= W, so the copy never overlaps its source)
        acc_ref[0:V, :] = acc_ref[W:, :]
        acc_ref[V:, :] = jnp.zeros_like(acc_ref[V:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, W + V), 1)
        oh = (loc == col).astype(jnp.bfloat16)
        x = data_ref[...]
        hi = x.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if split_hi_lo:
            # 0/1 one-hot entries are exact in bf16, so summing the bf16
            # hi/lo split of the data recovers ~f32 accuracy in 2 passes
            # (vs 6 for a HIGHEST-precision f32 matmul)
            lo = (x.astype(jnp.float32) - hi.astype(jnp.float32)).astype(
                jnp.bfloat16
            )
            part += jax.lax.dot_general(
                oh, lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] += part

    out_ref[...] = acc_ref[0:W, :]


@functools.partial(jax.jit,
                   static_argnames=("w", "v", "precision", "interpret"))
def _live_partials_call(blk, loc, data, *, w, v, precision, interpret):
    n_tiles, K = loc.shape
    D = data.shape[-1]
    W = w
    V = v or K
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high" and data.dtype == jnp.float32
    kernel = functools.partial(_seg_kernel, K, W, V, n_tiles, split)
    # Mosaic block rule: the last two block dims must divide (8, 128) or
    # equal the array dims — a [tiles, 1, K] view makes the (1, K) row
    # block legal
    loc3 = loc.reshape(n_tiles, 1, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, K),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, D), lambda t, b: (b[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((W + V, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB * W, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * K * (W + V) * D * (2 if split else 1),
            bytes_accessed=data.size * data.dtype.itemsize + NB * W * D * 4,
            transcendentals=0,
        ),
    )(blk, loc3, data)


def _seg_kernel_pair(K, W, V, n_tiles, split_hi_lo, blk_ref, loc_ref,
                     d1_ref, d2_ref, o1_ref, o2_ref, a1_ref, a2_ref):
    """Two independent segment sums sharing one grid pass and one-hot.

    Same contract as :func:`_seg_kernel` per tensor; pairing the
    backward's g_k/g_v reductions (same grouping, same aux) saves a full
    grid traversal + one-hot construction per pair — measured ~2.5 ms per
    pair at bench scale vs two separate calls (probe8/probe9).
    Concatenating instead ([E, 2D] through one matmul) LOSES: the one-hot
    matmul FLOPs double (probe6-f2).
    """
    t = pl.program_id(0)
    cur = blk_ref[t]
    prev = blk_ref[jnp.maximum(t - 1, 0)]

    @pl.when(t == 0)
    def _():
        a1_ref[...] = jnp.zeros_like(a1_ref)
        a2_ref[...] = jnp.zeros_like(a2_ref)

    @pl.when(jnp.logical_and(t > 0, cur != prev))
    def _():
        a1_ref[0:V, :] = a1_ref[W:, :]
        a1_ref[V:, :] = jnp.zeros_like(a1_ref[V:, :])
        a2_ref[0:V, :] = a2_ref[W:, :]
        a2_ref[V:, :] = jnp.zeros_like(a2_ref[V:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, W + V), 1)
        oh = (loc == col).astype(jnp.bfloat16)
        for x_ref, acc_ref in ((d1_ref, a1_ref), (d2_ref, a2_ref)):
            x = x_ref[...]
            hi = x.astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                oh, hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if split_hi_lo:
                lo = (x.astype(jnp.float32) - hi.astype(jnp.float32)
                      ).astype(jnp.bfloat16)
                part += jax.lax.dot_general(
                    oh, lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[...] += part

    o1_ref[...] = a1_ref[0:W, :]
    o2_ref[...] = a2_ref[0:W, :]


@functools.partial(jax.jit,
                   static_argnames=("w", "v", "precision", "interpret"))
def _live_partials_pair_call(blk, loc, d1, d2, *, w, v, precision,
                             interpret):
    n_tiles, K = loc.shape
    D = d1.shape[-1]
    W = w
    V = v or K
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high" and d1.dtype == jnp.float32
    kernel = functools.partial(_seg_kernel_pair, K, W, V, n_tiles, split)
    loc3 = loc.reshape(n_tiles, 1, K)
    data_spec = pl.BlockSpec(
        (K, D), lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec((W, D), lambda t, b: (b[t], 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, K),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            data_spec,
            data_spec,
        ],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[pltpu.VMEM((W + V, D), jnp.float32),
                        pltpu.VMEM((W + V, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NB * W, D), jnp.float32),
                   jax.ShapeDtypeStruct((NB * W, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_tiles * K * (W + V) * D * (2 if split else 1),
            bytes_accessed=2 * (d1.size * d1.dtype.itemsize
                                + NB * W * D * 4),
            transcendentals=0,
        ),
    )(blk, loc3, d1, d2)


def live_partials_pair(d1, d2, aux: PallasSegAux, *, precision: str = "high",
                       interpret: Optional[bool] = None):
    """Per-(tile, local-segment) partial sums of TWO same-shape sorted
    tensors under the same grouping — one grid pass, shared one-hot.
    Returns ``(p1, p2)``, each as :func:`live_partials` would."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if d1.shape != d2.shape:
        raise ValueError(f"pair shapes differ: {d1.shape} vs {d2.shape}")
    E, D = d1.shape
    n_tiles, K = aux.loc.shape
    if E != n_tiles * K:
        raise ValueError(f"data rows {E} != aux tiles {n_tiles} * {K}")
    return _live_partials_pair_call(
        jnp.asarray(aux.blk), jnp.asarray(aux.loc), d1, d2,
        w=aux.w, v=aux.v, precision=precision, interpret=interpret,
    )


def _softmax_kernel(K, W, n_tiles, split_hi_lo, blk_ref, loc_ref, att_ref,
                    m_out, s_out, m_acc, s_acc):
    t = pl.program_id(0)
    cur = blk_ref[t]
    prev = blk_ref[jnp.maximum(t - 1, 0)]

    @pl.when(t == 0)
    def _():
        m_acc[...] = jnp.zeros_like(m_acc)
        s_acc[...] = jnp.zeros_like(s_acc)

    @pl.when(jnp.logical_and(t > 0, cur != prev))
    def _():
        m_acc[0:K, :] = m_acc[W:, :]
        m_acc[K:, :] = jnp.zeros_like(m_acc[K:, :])
        s_acc[0:K, :] = s_acc[W:, :]
        s_acc[K:, :] = jnp.zeros_like(s_acc[K:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)                  # [K, 1] int32
        att = att_ref[...].astype(jnp.float32)                # [K, H]
        H = att.shape[-1]
        neg = jnp.float32(-1e30)

        # forward segmented running max (Hillis–Steele over same-loc runs)
        x = att
        s = 1
        while s < K:
            sx = jnp.concatenate(
                [jnp.full((s, H), neg, jnp.float32), x[:-s]], axis=0
            )
            sid = jnp.concatenate(
                [jnp.full((s, 1), -1, loc.dtype), loc[:-s]], axis=0
            )
            x = jnp.where(sid == loc, jnp.maximum(x, sx), x)
            s *= 2
        # reverse propagation: every row gets its full rank max
        s = 1
        while s < K:
            sx = jnp.concatenate(
                [x[s:], jnp.full((s, H), neg, jnp.float32)], axis=0
            )
            sid = jnp.concatenate(
                [loc[s:], jnp.full((s, 1), -2, loc.dtype)], axis=0
            )
            x = jnp.where(sid == loc, jnp.maximum(x, sx), x)
            s *= 2

        # canonical stabilizer: the bf16 rounding of the rank max. exp()
        # below and the level-2 combine both use exactly this value, so
        # the softmax VALUE stays exact while the emitted m rows are
        # bf16-representable (single-matmul emission loses nothing).
        m_can = x.astype(jnp.bfloat16).astype(jnp.float32)     # [K, H]
        # masked edges carry att == -1e30; bf16 rounding of the max can
        # land below it, so gate them to zero (real logits never approach
        # -5e29) and bound the exponent (<= 0.4% of |max| for real rows)
        ex = jnp.where(
            att > jnp.float32(-5e29),
            jnp.exp(jnp.minimum(att - m_can, jnp.float32(80.0))),
            0.0,
        )

        col = jax.lax.broadcasted_iota(jnp.int32, (K, K + W), 1)
        oh = (loc == col).astype(jnp.bfloat16)

        nxt = jnp.concatenate(
            [loc[1:], jnp.full((1, 1), -3, loc.dtype)], axis=0
        )
        is_last = loc != nxt                                    # [K, 1]
        m_contrib = jnp.where(is_last, m_can, 0.0).astype(jnp.bfloat16)
        m_acc[...] += jax.lax.dot_general(
            oh, m_contrib, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        hi = ex.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if split_hi_lo:
            lo = (ex - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            part += jax.lax.dot_general(
                oh, lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        s_acc[...] += part

    m_out[...] = m_acc[0:W, :]
    s_out[...] = s_acc[0:W, :]


@functools.partial(jax.jit, static_argnames=("w", "precision", "interpret"))
def _softmax_partials_call(blk, loc, att, *, w, precision, interpret):
    n_tiles, K = loc.shape
    H = att.shape[-1]
    W = w
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high"
    kernel = functools.partial(_softmax_kernel, K, W, n_tiles, split)
    loc3 = loc.reshape(n_tiles, 1, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, K),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, H), lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((W, H), lambda t, b: (b[t], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, H), lambda t, b: (b[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((K + W, H), jnp.float32),
                        pltpu.VMEM((K + W, H), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NB * W, H), jnp.float32),
                   jax.ShapeDtypeStruct((NB * W, H), jnp.float32)],
        interpret=interpret,
    )(blk, loc3, att)


def segment_softmax_partials(att, aux: PallasSegAux, *,
                             precision: str = "high",
                             interpret: Optional[bool] = None):
    """Per-(tile, local-segment) online-softmax partials of tgt-sorted
    ``att [E, H]`` — the fused flash-style stage-1 of the TPU-native
    segment softmax (replaces the reference's scatter-based
    ``torch_geometric.utils.softmax``, ``/root/reference/pyHGT/
    conv.py:8,108``).

    Returns ``(m_rows, s_rows)``, both ``[NB * W, H]`` f32: for live row
    j (segment-ordered, CSR ``aux.ptr2``), ``m_rows[j]`` is the
    bf16-canonical max of that (tile, segment) slice and ``s_rows[j]``
    the sum of ``exp(att - m)`` over it.  The caller combines rows with
    the standard online-softmax merge (see
    :func:`pyhgt_tpu.ops.sorted_hgt._softmax_pallas`); because ``exp``
    here and the combine both use the same canonical m, the softmax
    value is exact up to f32 rounding — the stabilizer being the bf16
    rounding of the max (≤0.4% off) affects only overflow headroom.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, H = att.shape
    n_tiles, K = aux.loc.shape
    if E != n_tiles * K:
        raise ValueError(f"att rows {E} != aux tiles {n_tiles} * {K}")
    return _softmax_partials_call(
        jnp.asarray(aux.blk), jnp.asarray(aux.loc), att,
        w=aux.w, precision=precision, interpret=interpret,
    )


def _head_map(H, D, dk, dtype):
    """In-kernel [H, D] one-hot head map: row h is 1 on head h's dk lanes
    (0/1 entries are exact in bf16)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // dk
        == jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
    ).astype(dtype)


def _hi_lo_dot(x, m):
    """~f32-accurate ``x @ m`` for exact (0/1) ``m``: two bf16 MXU passes
    on the hi/lo split of ``x`` (relative error ~2^-16)."""
    hi = x.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        hi, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    lo = (x.astype(jnp.float32) - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return out + jax.lax.dot_general(
        lo, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _headsum_prod_kernel(dk, a_ref, b_ref, o_ref):
    x = a_ref[...].astype(jnp.float32) * b_ref[...].astype(jnp.float32)
    D = x.shape[-1]
    H = D // dk
    # [D, H] map built directly (a .T on the [H, D] form would lower to a
    # real Mosaic transpose)
    hm = (
        jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // dk
        == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    ).astype(jnp.bfloat16)
    o_ref[...] = _hi_lo_dot(x, hm)


@functools.partial(jax.jit, static_argnames=("dk", "interpret"))
def _headsum_prod_call(a, b, *, dk, interpret):
    E, D = a.shape
    K = PK
    H = D // dk
    kernel = functools.partial(_headsum_prod_kernel, dk)
    in_spec = pl.BlockSpec((K, D), lambda t: (t, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(E // K,),
        in_specs=[in_spec, in_spec],
        out_specs=pl.BlockSpec((K, H), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((E, H), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * E * D * H,
            bytes_accessed=(a.size * a.dtype.itemsize
                            + b.size * b.dtype.itemsize + E * H * 4),
            transcendentals=0,
        ),
    )(a, b)


def head_sum_product(a, b, dk: int, *, interpret: Optional[bool] = None):
    """Fused per-head reduction ``[E, H] = Σ_lanes (a ⊙ b)`` without
    materializing the [E, D] product.

    Equivalent to ``_head_sum(a.astype(f32) * b.astype(f32))`` in
    :mod:`pyhgt_tpu.ops.sorted_hgt` — but that form makes the f32 product
    a matmul *operand*, which XLA materializes in HBM (463 MB/use at
    bench scale). Here the product lives only in VMEM; accuracy is the
    hi/lo bf16 split (~2^-16 relative, vs exact for the XLA HIGHEST
    path). Requires ``E % PK == 0`` (the sorted layout pads to PK,
    sampling/sorted_batch.py)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if a.shape != b.shape:
        raise ValueError(f"shapes differ: {a.shape} vs {b.shape}")
    E, D = a.shape
    if E % PK or D % dk:
        raise ValueError(f"E={E} not a multiple of {PK} or D={D} % dk")
    return _headsum_prod_call(a, b, dk=dk, interpret=interpret)


def _seg_kernel_weighted(K, W, n_tiles, dk, split_hi_lo, blk_ref, loc_ref,
                         w_ref, v_ref, out_ref, acc_ref):
    """Like :func:`_seg_kernel` but the reduced rows are the per-head
    weighted messages ``head_expand(w) ⊙ v``, formed in VMEM."""
    t = pl.program_id(0)
    cur = blk_ref[t]
    prev = blk_ref[jnp.maximum(t - 1, 0)]

    @pl.when(t == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(t > 0, cur != prev))
    def _():
        acc_ref[0:K, :] = acc_ref[W:, :]
        acc_ref[K:, :] = jnp.zeros_like(acc_ref[K:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, K + W), 1)
        oh = (loc == col).astype(jnp.bfloat16)
        v = v_ref[...]
        D = v.shape[-1]
        H = D // dk
        wt = w_ref[...].astype(jnp.float32)                    # [K, H]
        w_exp = _hi_lo_dot(wt, _head_map(H, D, dk, jnp.bfloat16))
        x = w_exp * v.astype(jnp.float32)                      # [K, D]
        hi = x.astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh, hi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if split_hi_lo:
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            part += jax.lax.dot_general(
                oh, lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_ref[...] += part

    out_ref[...] = acc_ref[0:W, :]


@functools.partial(jax.jit,
                   static_argnames=("dk", "wout", "precision", "interpret"))
def _live_partials_weighted_call(blk, loc, w, v, *, dk, wout, precision,
                                 interpret):
    n_tiles, K = loc.shape
    D = v.shape[-1]
    W = wout
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high" and v.dtype == jnp.float32
    kernel = functools.partial(_seg_kernel_weighted, K, W, n_tiles, dk, split)
    loc3 = loc.reshape(n_tiles, 1, K)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, K),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D // dk),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((W, D), lambda t, b: (b[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K + W, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB * W, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * K * (K + W) * D * (2 if split else 1),
            bytes_accessed=(v.size * v.dtype.itemsize + w.size * 4
                            + NB * W * D * 4),
            transcendentals=0,
        ),
    )(blk, loc3, w, v)


def live_partials_weighted(w, v, dk: int, aux: PallasSegAux, *,
                           precision: str = "high",
                           interpret: Optional[bool] = None):
    """Per-(tile, local-segment) partial sums of the weighted messages
    ``head_expand(w) ⊙ v`` — :func:`live_partials` with the per-edge
    product fused into the kernel, so the [E, D] message tensor is never
    written to HBM (the forward's biggest remaining materialization; it
    exists only tile-by-tile in VMEM). ``w [E, H]`` per-head scalars,
    ``v [E, D]`` values, both in the grouping's edge order."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, D = v.shape
    if w.shape != (E, D // dk):
        raise ValueError(f"w {w.shape} != ({E}, {D // dk})")
    n_tiles, K = aux.loc.shape
    if E != n_tiles * K:
        raise ValueError(f"data rows {E} != aux tiles {n_tiles} * {K}")
    return _live_partials_weighted_call(
        jnp.asarray(aux.blk), jnp.asarray(aux.loc), w, v,
        dk=dk, wout=aux.w, precision=precision, interpret=interpret,
    )


def _seg_kernel_slab(K, W, V, n_tiles, split_hi_lo, blk_ref, loc_ref,
                     d_ref, o1_ref, o2_ref, a1_ref, a2_ref):
    """Two segment sums over the lane halves of ONE [K, 2D] input slab.

    Same math as :func:`_seg_kernel_pair`, but the two tensors arrive
    lane-concatenated: the caller pays ONE [E, 2D] HBM stream (and, in the
    backward, ONE 2 KB-row permute-gather instead of two 1 KB-row ones —
    permutes are row-size-bound, docs/PERF_NOTES.md round-2 probe p2).
    The matmuls stay per-half (one [K, K+W] @ [K, 2D] pass measured slower
    than two D-wide passes, probe6-f2)."""
    t = pl.program_id(0)
    cur = blk_ref[t]
    prev = blk_ref[jnp.maximum(t - 1, 0)]

    @pl.when(t == 0)
    def _():
        a1_ref[...] = jnp.zeros_like(a1_ref)
        a2_ref[...] = jnp.zeros_like(a2_ref)

    @pl.when(jnp.logical_and(t > 0, cur != prev))
    def _():
        a1_ref[0:V, :] = a1_ref[W:, :]
        a1_ref[V:, :] = jnp.zeros_like(a1_ref[V:, :])
        a2_ref[0:V, :] = a2_ref[W:, :]
        a2_ref[V:, :] = jnp.zeros_like(a2_ref[V:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, W + V), 1)
        oh = (loc == col).astype(jnp.bfloat16)
        D = d_ref.shape[-1] // 2
        for sl, acc_ref in ((d_ref[:, :D], a1_ref), (d_ref[:, D:], a2_ref)):
            hi = sl.astype(jnp.bfloat16)
            part = jax.lax.dot_general(
                oh, hi, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if split_hi_lo:
                lo = (sl.astype(jnp.float32) - hi.astype(jnp.float32)
                      ).astype(jnp.bfloat16)
                part += jax.lax.dot_general(
                    oh, lo, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc_ref[...] += part

    o1_ref[...] = a1_ref[0:W, :]
    o2_ref[...] = a2_ref[0:W, :]


@functools.partial(jax.jit,
                   static_argnames=("w", "v", "precision", "interpret"))
def _live_partials_slab_call(blk, loc, data, *, w, v, precision, interpret):
    n_tiles, K = loc.shape
    D2 = data.shape[-1]
    D = D2 // 2
    W = w
    V = v or K
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high" and data.dtype == jnp.float32
    kernel = functools.partial(_seg_kernel_slab, K, W, V, n_tiles, split)
    loc3 = loc.reshape(n_tiles, 1, K)
    out_spec = pl.BlockSpec((W, D), lambda t, b: (b[t], 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blk.shape[0],),
        in_specs=[
            pl.BlockSpec((1, 1, K),
                         lambda t, b: (jnp.minimum(t, n_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D2), lambda t, b: (jnp.minimum(t, n_tiles - 1), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[pltpu.VMEM((W + V, D), jnp.float32),
                        pltpu.VMEM((W + V, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NB * W, D), jnp.float32),
                   jax.ShapeDtypeStruct((NB * W, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * K * (W + V) * D2 * (2 if split else 1),
            bytes_accessed=data.size * data.dtype.itemsize
            + 2 * NB * W * D * 4,
            transcendentals=0,
        ),
    )(blk, loc3, data)


def live_partials_slab(data, aux: PallasSegAux, *, precision: str = "high",
                       interpret: Optional[bool] = None):
    """Per-(tile, local-segment) partial sums of the two lane halves of
    sorted ``data [E, 2D]`` under one grouping — one grid pass, one HBM
    stream, shared one-hot. Returns ``(p1, p2)``, each ``[NB * W, D]`` as
    :func:`live_partials` would for the corresponding half."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, D2 = data.shape
    if D2 % 256:
        raise ValueError(f"slab lanes {D2} must split into 128-aligned halves")
    n_tiles, K = aux.loc.shape
    if E != n_tiles * K:
        raise ValueError(f"data rows {E} != aux tiles {n_tiles} * {K}")
    return _live_partials_slab_call(
        jnp.asarray(aux.blk), jnp.asarray(aux.loc), data,
        w=aux.w, v=aux.v, precision=precision, interpret=interpret,
    )


def live_partials(data, aux: PallasSegAux, *, precision: str = "high",
                  interpret: Optional[bool] = None):
    """Per-(tile, local-segment) partial sums of sorted ``data [E, D]``.

    Returns ``[NB * W, D]`` f32; rows ``live_off[t] + rank`` hold the
    tile-t partial for its rank-th distinct segment (same ordering as the
    level-2 CSR ``aux.ptr2``); all other rows are zero.

    ``precision='high'`` runs a bf16 hi/lo-split double matmul (~f32
    accurate); ``'fastest'`` a single bf16 pass — matching the precision
    class of XLA's default f32 matmul lowering on this platform
    (docs/PERF_NOTES.md).  bf16 inputs always take the single pass.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    E, D = data.shape
    n_tiles, K = aux.loc.shape
    if E != n_tiles * K:
        raise ValueError(f"data rows {E} != aux tiles {n_tiles} * {K}")
    return _live_partials_call(
        jnp.asarray(aux.blk), jnp.asarray(aux.loc), data,
        w=aux.w, v=aux.v, precision=precision, interpret=interpret,
    )
