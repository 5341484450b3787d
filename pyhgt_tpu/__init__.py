"""pyhgt_tpu — a TPU-native heterogeneous graph transformer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of acbull/pyHGT
(WWW'20 Heterogeneous Graph Transformer, reference at /root/reference):

- typed temporal heterogeneous graph container  (:mod:`pyhgt_tpu.graph`)
- HGSampling type-balanced importance sampler   (:mod:`pyhgt_tpu.sampling`)
- fused HGT attention ops (SDDMM -> segment softmax -> SpMM)
                                                 (:mod:`pyhgt_tpu.ops`)
- flax model zoo: HGTConv / DenseHGTConv / GNN / heads
                                                 (:mod:`pyhgt_tpu.models`)
- jit training loop, optimizers, schedules, checkpointing
                                                 (:mod:`pyhgt_tpu.train`)
- SPMD scale-out over jax.sharding meshes        (:mod:`pyhgt_tpu.parallel`)

Design principle (vs the reference's per-meta-relation Python triple loop,
``/root/reference/pyHGT/conv.py:71-78``): every batch has a *static* layout —
type-contiguous padded node blocks ``[T, C, D]`` and per-meta-relation edge
blocks with fixed capacities — so the whole model is one traced XLA program
with all FLOPs in batched dense matmuls on the MXU and the edge stage as
gather / segment-softmax / scatter-add (Pallas-fusable).
"""

__version__ = "0.1.0"

from pyhgt_tpu.graph import Graph, GraphSchema, CSRGraph  # noqa: F401
from pyhgt_tpu.sampling import (  # noqa: F401
    HGSampler,
    PadSpec,
    SubgraphBatch,
)
from pyhgt_tpu.config import ExperimentConfig, PRESETS  # noqa: F401


def __getattr__(name):  # lazy heavyweight subpackages (jax import cost)
    import importlib

    if name in ("models", "ops", "tasks", "train", "parallel", "datasets",
                "experiments", "flagship"):
        return importlib.import_module(f"pyhgt_tpu.{name}")
    raise AttributeError(name)
