from pyhgt_tpu.graph.container import Graph
from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, EdgeBlockSpec
from pyhgt_tpu.graph.csr import CSRGraph

__all__ = [
    "Graph",
    "GraphSchema",
    "MetaRelation",
    "EdgeBlockSpec",
    "CSRGraph",
]
