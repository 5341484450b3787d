from pyhgt_tpu.sampling.hgsampler import HGSampler, RawSample, mask_seed_edges
from pyhgt_tpu.sampling.batch import BatchLayout, SubgraphBatch, pad_sample
from pyhgt_tpu.graph.schema import PadSpec

__all__ = [
    "HGSampler",
    "RawSample",
    "mask_seed_edges",
    "BatchLayout",
    "SubgraphBatch",
    "pad_sample",
    "PadSpec",
]
