"""Flagship model assembly — an ogbn-mag-shaped HGT node classifier.

One place that wires schema → layout → model → loss → train step, used by
``__graft_entry__.py`` (driver compile checks), ``bench.py`` (edges/s), and
the SPMD dry run. The graph shape mirrors ogbn-mag
(``/root/reference/ogbn-mag/preprocess_ogbn_mag.py:29-42``): paper/author/
field/institution with writes/cites/has-topic/affiliated-with + reverses;
the model recipe mirrors the published reproduction config
(``ogbn-mag/README.md:16-24``: 4 layers, n_hid 512, 8 heads, RTE on).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.models import GNN, Classifier
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.sampling.batch import BatchLayout, SubgraphBatch
from pyhgt_tpu.train.step import nll_loss
from pyhgt_tpu.utils.synth import synth_batch

import flax.linen as nn


def flagship_schema() -> GraphSchema:
    m = MetaRelation
    return GraphSchema(
        node_types=("paper", "author", "field", "institution"),
        metas=(
            m("paper", "author", "AP_write"),
            m("author", "paper", "rev_AP_write"),
            m("paper", "paper", "PP_cite"),
            m("paper", "paper", "rev_PP_cite"),
            m("field", "paper", "PF_in"),
            m("paper", "field", "rev_PF_in"),
            m("institution", "author", "in"),
            m("author", "institution", "rev_in"),
        ),
    )


@dataclasses.dataclass(frozen=True)
class FlagshipConfig:
    node_cap: int
    edge_cap: int
    in_dim: int
    n_hid: int
    n_heads: int
    n_layers: int
    n_classes: int
    n_seed: int
    dropout: float = 0.2
    remat: bool = False
    save_kv: bool = False
    edge_bf16: bool = False
    edge_bwd: str = "permute"
    seg_pallas: bool = False
    softmax_pallas: bool = False  # experimental (probe8-p5: standalone win,
    # full-step regression — see PERF_NOTES round 2)
    edge_impl: str = "sorted"  # scatter-free path is the TPU default
    seg_tile: int = 0          # Pallas kernel tile size K
    # (0 = ops.pallas_seg.PK default; chip-sweep knob — FLOPs ∝ K+W)
    seg_w: int = 0             # Pallas output-block size W (0 = K)
    src_rank_cap: int = 0      # src-grouping rank cap with singleton
    # split (degree-1 sources bypass the kernel via a gather)
    src_split_cap: int = 0     # two-region src reduction (round-4):
    # meta blocks through a kernel rank-capped at this value, the
    # self-block tail through a plain CSR — needs the meta capacities
    # tile-aligned (see sampling/sorted_batch._src_split_aux)
    tab_cap: int = 0           # tab compaction (round-4): per-block
    # occupied-Δt rank remap; the tab kernels' one-hot narrows from
    # W+L=480 to ~2*cap (falls back per batch if a block occupies more
    # Δt slots than the cap)
    softmax_tilemax: str = ""  # "" | "on" | "auto" (runtime-guarded
    # per-tile-max online softmax; see ops/sorted_hgt)
    seg_rank_cap: int = 0      # tgt-grouping rank cap V (0 = off): the
    # kernel one-hot narrows from K+W to V+V when live rows per tile
    # stay under V (measured 50 max at bench scale; see PERF_NOTES r3)
    graph_axis: str = ""       # mesh axis name for edge-partitioned runs
    gp_overlap: bool = False   # gp: ring-allreduce boundary exchange
    # (parallel/edge_partition._ring_allreduce; ICI-pipelinable form)
    param_bf16: bool = False   # bf16 weight banks at apply time, f32
    # masters in the train state (train/optim.bf16_param_cast)


PRESETS: Dict[str, FlagshipConfig] = {
    # quick single-chip compile check
    "tiny": FlagshipConfig(
        node_cap=128, edge_cap=256, in_dim=128, n_hid=128,
        n_heads=4, n_layers=2, n_classes=16, n_seed=32,
    ),
    # multi-chip dry run on virtual CPU devices
    "dryrun": FlagshipConfig(
        node_cap=32, edge_cap=64, in_dim=32, n_hid=32,
        n_heads=4, n_layers=2, n_classes=8, n_seed=8,
    ),
    # the ogbn-mag reproduction scale (README.md:16-24: depth 6 width 520
    # -> ~3248 nodes/type; 4x512x8 model)
    "bench": FlagshipConfig(
        node_cap=3328, edge_cap=26624, in_dim=512, n_hid=512,
        n_heads=8, n_layers=4, n_classes=349, n_seed=128,
        remat=False, save_kv=True,  # custom-VJP residuals are node-level;
        # saving per-edge K/V/Q removes 3 backward HBM gathers per layer
        edge_bf16=True, seg_pallas=True,  # measured winners (PERF_NOTES
        # round 2): bf16 edge stage 304->291 ms, Pallas segment-sum
        # kernel 291->224 ms on the chip
        seg_rank_cap=64,  # round-3: tgt tiles carry <=50 live rows at
        # this scale, so the tgt kernels' one-hot narrows 768->128 wide
        # (135.8 -> 129.5 ms; falls back per batch if ever violated)
        tab_cap=64,  # round-4: blocks occupy <=60 of 240 dt slots, so
        # the tab-window kernels' one-hot narrows 480->128 wide
        # (127.1 -> 123.2 ms; falls back per batch if ever violated)
        softmax_tilemax="on",  # round-4: -2.4 ms. Unguarded: exact while
        # per-tile logit spread < ~87 (bench logits are ~1e3x inside the
        # bound); the always-exact "auto" guard measured +3 ms (lax.cond
        # stops w fusing into consumers) — see PERF_NOTES round-4
    ),
}


class FlagshipModel(nn.Module):
    """GNN + Classifier over the paper-seed slice (the composition every
    reference training script builds by hand, e.g.
    ``ogbn-mag/train_ogbn_mag.py:109-116``)."""

    cfg: FlagshipConfig
    num_types: int
    num_relations: int

    def setup(self):
        c = self.cfg
        self.gnn = GNN(
            in_dim=c.in_dim,
            n_hid=c.n_hid,
            num_types=self.num_types,
            num_relations=self.num_relations,
            n_heads=c.n_heads,
            n_layers=c.n_layers,
            dropout=c.dropout,
            conv_name="hgt",
            prev_norm=True,
            last_norm=True,
            use_rte=True,
            remat=c.remat,
            edge_impl=c.edge_impl,
            save_kv=c.save_kv,
            edge_bf16=c.edge_bf16,
            edge_bwd=c.edge_bwd,
            seg_pallas=c.seg_pallas,
            softmax_pallas=c.softmax_pallas,
            softmax_tilemax=c.softmax_tilemax,
            graph_axis=c.graph_axis,
            gp_overlap=c.gp_overlap,
        )
        self.clf = Classifier(n_out=c.n_classes)

    def __call__(
        self, node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask,
        em: EdgeStaticMeta, deterministic: bool = True, se=None, pe=None,
    ):
        h = self.gnn(
            node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask, em,
            deterministic=deterministic, se=se, pe=pe,
        )
        seeds = h[0, : self.cfg.n_seed]  # paper seeds come first by contract
        return self.clf(seeds)


@dataclasses.dataclass
class Flagship:
    cfg: FlagshipConfig
    schema: GraphSchema
    layout: BatchLayout
    em: EdgeStaticMeta
    model: FlagshipModel

    def init_params(self, rng_key, batch: SubgraphBatch, se=None):
        se = se or self.sort(batch)
        return self.model.init(rng_key, *self.batch_args(batch), self.em, se=se)

    def sort(self, batch: SubgraphBatch):
        from pyhgt_tpu.sampling.sorted_batch import sort_batch

        # gp partitions the returned SortedEdges and rebuilds per-shard
        # aux from the raw arrays, which must stay in the uncompacted
        # B*L tab space / unsplit src space — tab_cap and tgt_rank_cap
        # apply PER SHARD inside partition_sorted (round-5; pass
        # cfg.tab_cap / cfg.seg_rank_cap there), so gp runs the full
        # production preset. src knobs remain single-chip-only.
        gp = bool(self.cfg.graph_axis)
        return sort_batch(batch, self.layout, self.em,
                          pk=self.cfg.seg_tile or None,
                          pw=self.cfg.seg_w or None,
                          tgt_rank_cap=0 if gp else self.cfg.seg_rank_cap,
                          src_rank_cap=0 if gp else self.cfg.src_rank_cap,
                          tab_cap=0 if gp else self.cfg.tab_cap,
                          src_split_cap=0 if gp else self.cfg.src_split_cap)

    def batch_args(self, batch: SubgraphBatch):
        return (
            batch.node_feat,
            batch.edge_src,
            batch.edge_tgt,
            batch.edge_dt,
            batch.edge_mask,
            batch.node_mask,
        )

    def forward_fn(self):
        """Pure jittable forward: (params, *batch_args) -> log_probs."""
        em = self.em

        def fwd(params, node_feat, edge_src, edge_tgt, edge_dt, edge_mask,
                node_mask, se):
            return self.model.apply(
                params, node_feat, edge_src, edge_tgt, edge_dt, edge_mask,
                node_mask, em, se=se,
            )

        return fwd

    def loss_fn_single(self):
        """(params, rng, batch_args..., se, labels) -> scalar — unbatched.

        Prefer this on one chip: vmap with a size-1 leading axis turns the
        edge gathers into batched gathers and costs ~20% (measured).
        """
        em = self.em
        model = self.model
        from pyhgt_tpu.parallel.edge_partition import PartitionedEdges

        param_bf16 = self.cfg.param_bf16

        def loss(params, rng, nf, es, et, dt, emk, nmk, se, labels):
            if param_bf16:
                from pyhgt_tpu.train.optim import bf16_param_cast

                params = bf16_param_cast(params)
            kw = {"pe": se} if isinstance(se, PartitionedEdges) else {"se": se}
            logp = model.apply(
                params, nf, es, et, dt, emk, nmk, em,
                deterministic=False, rngs={"dropout": rng}, **kw,
            )
            return nll_loss(logp, labels)

        return loss

    def loss_fn(self):
        """(params, rng, stacked_batch_args..., labels) -> scalar.

        Stacked leading axis = data-parallel subgraphs; dropout rngs are
        split per subgraph. (For production dp prefer shard_map over the
        data axis so each device runs the unbatched program.)
        """
        em = self.em
        model = self.model
        param_bf16 = self.cfg.param_bf16

        def per_graph(params, rng, nf, es, et, dt, emk, nmk, se, labels):
            logp = model.apply(
                params, nf, es, et, dt, emk, nmk, em, se=se,
                deterministic=False, rngs={"dropout": rng},
            )
            return nll_loss(logp, labels)

        def loss(params, rng, nf, es, et, dt, emk, nmk, se, labels):
            if param_bf16:
                from pyhgt_tpu.train.optim import bf16_param_cast

                params = bf16_param_cast(params)
            rngs = jax.random.split(rng, nf.shape[0])
            losses = jax.vmap(
                per_graph, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0)
            )(params, rngs, nf, es, et, dt, emk, nmk, se, labels)
            return jnp.mean(losses)

        return loss


def build_flagship(preset: str = "tiny", **overrides) -> Flagship:
    cfg = PRESETS[preset]
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    schema = flagship_schema()
    pad = PadSpec(node_cap=cfg.node_cap, default_edge_cap=cfg.edge_cap)
    layout = BatchLayout(schema=schema, pad=pad)
    em = EdgeStaticMeta.from_layout(layout)
    model = FlagshipModel(
        cfg=cfg, num_types=schema.num_types, num_relations=schema.num_relations
    )
    return Flagship(cfg=cfg, schema=schema, layout=layout, em=em, model=model)


def synth_flagship_batch(fl: Flagship, seed: int = 0, edge_fill: float = 1.0):
    rng = np.random.default_rng(seed)
    batch = synth_batch(
        fl.layout, rng, din=fl.cfg.in_dim, node_fill=1.0, edge_fill=edge_fill
    )
    labels = rng.integers(0, fl.cfg.n_classes, size=fl.cfg.n_seed).astype(np.int32)
    return batch, labels
