"""Kernel layer: segment ops, relative temporal encoding, fused HGT attention.

The reference delegates its edge compute to PyG MessagePassing + torch-scatter
(``/root/reference/pyHGT/conv.py:13,57-58``) around a per-meta-relation Python
triple loop (``conv.py:71-78``). Here the whole layer is one traced XLA
program over static shapes; see :mod:`pyhgt_tpu.ops.hgt` for the algebraic
re-derivation that turns the loop into batched MXU matmuls.
"""

from pyhgt_tpu.ops.segment import segment_softmax, segment_sum, segment_max
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.ops.hgt import EdgeStaticMeta, hgt_conv_core

__all__ = [
    "segment_softmax",
    "segment_sum",
    "segment_max",
    "rte_sin_table",
    "EdgeStaticMeta",
    "hgt_conv_core",
]
