"""Model zoo: HGT / DenseHGT / GCN / GAT convs, GNN stack, task heads.

Flax re-designs of the reference modules (``/root/reference/pyHGT/conv.py``,
``/root/reference/pyHGT/model.py``): parameters live in stacked per-type /
per-relation banks instead of ModuleLists of Linears, and every forward is a
single traced XLA program over the static padded batch layout.
"""

from pyhgt_tpu.models.conv import (
    HGTConv, DenseHGTConv, GCNConv, GATConv, RGCNConv, HANConv, HetGNNConv,
    GeneralConv,
)
from pyhgt_tpu.models.model import GNN, Classifier, Matcher
from pyhgt_tpu.models.composite import NodeClassifierModel, LinkMatcherModel

__all__ = [
    "HGTConv",
    "DenseHGTConv",
    "GCNConv",
    "GATConv",
    "RGCNConv",
    "HANConv",
    "HetGNNConv",
    "GeneralConv",
    "GNN",
    "Classifier",
    "Matcher",
    "NodeClassifierModel",
    "LinkMatcherModel",
]
