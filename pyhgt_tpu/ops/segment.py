"""Masked segment primitives over flat edge arrays.

TPU-native replacements for the reference's native scatter machinery:
``torch_geometric.utils.softmax`` (per-target segment softmax,
``/root/reference/pyHGT/conv.py:8,108``) and the ``scatter_add`` hidden in
PyG ``MessagePassing(aggr='add')`` (``conv.py:13``).

All functions take a ``mask`` because batches are padded to static shapes:
masked lanes contribute exactly zero. ``num_segments`` is static so the ops
trace once per layout. XLA lowers ``jax.ops.segment_*`` to sort-free
scatter-reduce with duplicate indices SERIALIZED (~50 ns/edge measured);
the production paths avoid these (ops/sorted_hgt.py tiled reductions) while
these remain the readable reference semantics for parity tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large-negative sentinel; avoids -inf (exp(-inf - -inf) = nan on empty
# segments) while still vanishing under exp after max-subtraction.
NEG = -1e30


def segment_sum(data, segment_ids, num_segments, mask=None):
    """Masked sum of ``data`` rows into ``num_segments`` buckets."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data, segment_ids, num_segments, mask=None):
    """Masked max per segment; empty/masked segments return ``NEG``."""
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
        data = jnp.where(m, data, NEG)
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_softmax(scores, segment_ids, num_segments, mask=None):
    """Numerically-stable softmax over each target-node segment.

    Semantics of ``torch_geometric.utils.softmax`` (used at
    ``/root/reference/pyHGT/conv.py:108``): subtract the per-segment max,
    exponentiate, normalize by the per-segment sum. Masked edges get weight
    0; segments with no valid edges produce all-zero weights (padded nodes).

    ``scores``: [E] or [E, H]; ``segment_ids``: [E] int; returns same shape.
    """
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - mask.ndim))
        scores = jnp.where(m, scores, NEG)
    seg_max = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    seg_max = jnp.maximum(seg_max, NEG)  # empty segments: -inf -> NEG
    ex = jnp.exp(scores - seg_max[segment_ids])
    if mask is not None:
        m = mask.reshape(mask.shape + (1,) * (scores.ndim - mask.ndim))
        ex = jnp.where(m, ex, 0.0)
    den = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    den = jnp.where(den > 0, den, 1.0)
    return ex / den[segment_ids]
