"""Device mesh + sharding rules for the HGT parameter banks.

Sharding design (scaling-book style: annotate, let GSPMD insert
collectives):

- **data axis**: subgraph batches stack on a leading axis sharded over
  'data'; gradients psum over ICI automatically under jit.
- **model axis**: megatron-style tensor parallelism over the *head*
  dimension. The QKV projections ``[T, Din, Dout]`` are column-parallel
  (Dout = H·dk sharded), the relation banks ``[R, H, dk, dk]`` shard over
  H, attention is head-local, and the output projection ``wa`` is
  row-parallel (input Dout sharded) with GSPMD reducing the partial sums.
  Norms, gates, biases of row-parallel layers, and the task heads stay
  replicated — they are tiny.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
GRAPH_AXIS = "graph"   # edge-partition axis (parallel/edge_partition.py)


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_graph: int = 1,
    devices=None,
) -> Mesh:
    """Build a (data, model, graph) mesh. Defaults: all devices on the
    data axis. The graph axis carries edge-partition (SP-analogue)
    shards — contiguous slices of one oversized subgraph's sorted edges."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // (n_model * n_graph)
    if n_data * n_model * n_graph != n:
        raise ValueError(f"{n_data}x{n_model}x{n_graph} mesh != {n} devices")
    arr = np.asarray(devices).reshape(n_data, n_model, n_graph)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, GRAPH_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (stacked-subgraph) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# parameter-name -> PartitionSpec rules (applied by trailing path match)
_PARAM_RULES = (
    # column-parallel QKV + their biases: shard Dout (= heads*dk)
    (r"(wq|wk|wv)$", P(None, None, MODEL_AXIS)),
    (r"(bq|bk|bv)$", P(None, MODEL_AXIS)),
    # row-parallel output projection: shard the *input* Dout axis
    (r"wa$", P(None, MODEL_AXIS, None)),
    # relation banks: shard heads
    (r"(rel_att|rel_msg)$", P(None, MODEL_AXIS, None, None)),
    (r"rel_pri$", P(None, MODEL_AXIS)),
    # input adapters: column-parallel into n_hid
    (r"adapt_w$", P(None, None, MODEL_AXIS)),
    (r"adapt_b$", P(None, MODEL_AXIS)),
)


def _spec_for(path_names, leaf) -> P:
    name = path_names[-1] if path_names else ""
    for pat, spec in _PARAM_RULES:
        if re.search(pat, name):
            if len(spec) == np.ndim(leaf):
                return spec
    return P()  # replicate everything else (norms, gates, heads, rte)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings for a model param tree."""

    def leaf_sharding(path, leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return NamedSharding(mesh, _spec_for(names, leaf))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def shard_params(params, mesh: Mesh):
    """device_put params according to :func:`param_shardings`."""
    return jax.device_put(params, param_shardings(params, mesh))
