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
# the one-hot width is K + W.
PK = 512
PW = 512


@struct.dataclass
class PallasSegAux:
    """Host-precomputed per-grouping aux for :func:`live_partials`.

    ``loc [tiles, K]``: each edge's column in the one-hot — its global
    live-row index minus ``blk[tile] * W`` (in ``[0, K + W)``).
    ``blk [tiles + NB - 1]``: output block index per grid step; the
    trailing ``NB - 1`` sentinel steps flush the carry and zero the tail.
    ``ptr2 [S + 1]``: CSR over live rows per segment (level-2 combine).
    """

    loc: np.ndarray
    blk: np.ndarray
    ptr2: np.ndarray


def _seg_kernel(K, W, n_tiles, split_hi_lo, blk_ref, loc_ref, data_ref,
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
        # straddling rows (local offset >= W) become the new block's head
        acc_ref[0:W, :] = acc_ref[W:, :]
        acc_ref[W:, :] = jnp.zeros_like(acc_ref[W:, :])

    @pl.when(t < n_tiles)
    def _():
        loc = loc_ref[0, 0, :].reshape(K, 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, K + W), 1)
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


@functools.partial(jax.jit, static_argnames=("precision", "interpret"))
def _live_partials_call(blk, loc, data, *, precision, interpret):
    n_tiles, K = loc.shape
    D = data.shape[-1]
    W = PW
    NB = blk.shape[0] - n_tiles + 1
    split = precision == "high" and data.dtype == jnp.float32
    kernel = functools.partial(_seg_kernel, K, W, n_tiles, split)
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
        scratch_shapes=[pltpu.VMEM((K + W, D), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NB * W, D), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * K * (K + W) * D * (2 if split else 1),
            bytes_accessed=data.size * data.dtype.itemsize + NB * W * D * 4,
            transcendentals=0,
        ),
    )(blk, loc3, data)


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
        precision=precision, interpret=interpret,
    )
