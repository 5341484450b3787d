"""GNN stack and task heads.

Parity targets in ``/root/reference/pyHGT/model.py``: ``GNN`` (:54-80),
``Classifier`` (:3-14), ``Matcher`` (:16-49).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from pyhgt_tpu.models.conv import GeneralConv
from pyhgt_tpu.ops.hgt import EdgeStaticMeta, typed_linear


class GNN(nn.Module):
    """Per-type input adaptation + a stack of GeneralConv layers
    (``model.py:54-80``).

    The reference's per-type ``adapt_ws`` Linear loop (:70-76) is one
    batched ``[T,C,Din]×[T,Din,n_hid]`` matmul here. ``prev_norm`` /
    ``last_norm`` mirror the reference's (drifted) defaults — SURVEY.md §0.
    """

    in_dim: int
    n_hid: int
    num_types: int
    num_relations: int
    n_heads: int
    n_layers: int
    dropout: float = 0.2
    conv_name: str = "hgt"
    prev_norm: bool = False
    last_norm: bool = False
    use_rte: bool = True
    remat: bool = False
    edge_impl: str = "segment"
    save_kv: bool = False
    edge_bf16: bool = False
    edge_bwd: str = "permute"
    seg_pallas: bool = False
    softmax_pallas: bool = False
    softmax_tilemax: str = ""
    graph_axis: str = ""
    gp_overlap: bool = False

    def setup(self):
        self.adapt_w = self.param(
            "adapt_w", nn.initializers.lecun_normal(),
            (self.num_types, self.in_dim, self.n_hid),
        )
        self.adapt_b = self.param(
            "adapt_b", nn.initializers.zeros, (self.num_types, self.n_hid)
        )
        self.drop = nn.Dropout(self.dropout)
        convs = []
        for li in range(self.n_layers):
            is_last = li == self.n_layers - 1
            convs.append(
                GeneralConv(
                    conv_name=self.conv_name,
                    in_dim=self.n_hid,
                    out_dim=self.n_hid,
                    num_types=self.num_types,
                    num_relations=self.num_relations,
                    n_heads=self.n_heads,
                    dropout=self.dropout,
                    use_norm=self.last_norm if is_last else self.prev_norm,
                    use_rte=self.use_rte,
                    remat=self.remat,
                    edge_impl=self.edge_impl,
                    save_kv=self.save_kv,
                    edge_bf16=self.edge_bf16,
                    edge_bwd=self.edge_bwd,
                    seg_pallas=self.seg_pallas,
                    softmax_pallas=self.softmax_pallas,
                    softmax_tilemax=self.softmax_tilemax,
                    graph_axis=self.graph_axis,
                    gp_overlap=self.gp_overlap,
                )
            )
        self.convs = convs

    def __call__(
        self,
        node_feat,            # [T, C, Din]
        edge_src,
        edge_tgt,
        edge_dt,
        edge_mask,
        node_mask,            # [T, C]
        em: EdgeStaticMeta,
        deterministic: bool = True,
        se=None,
        pe=None,
    ):
        h = jnp.tanh(typed_linear(node_feat, self.adapt_w, self.adapt_b))
        h = self.drop(h, deterministic=deterministic)
        h = h * node_mask[..., None]
        for conv in self.convs:
            h = conv(
                h, edge_src, edge_tgt, edge_dt, edge_mask, node_mask, em,
                deterministic=deterministic, se=se, pe=pe,
            )
        return h


class Classifier(nn.Module):
    """Linear + log_softmax head (``model.py:3-14``). Pairs with KL-div
    loss for multi-label tasks and NLL for single-label tasks, exactly as
    the reference scripts do (``OAG/train_paper_field.py:87``,
    ``ogbn-mag/train_ogbn_mag.py:116``)."""

    n_out: int

    @nn.compact
    def __call__(self, x):
        return jax.nn.log_softmax(nn.Dense(self.n_out)(x), axis=-1)


class Matcher(nn.Module):
    """Two-tower dot-product scorer for link prediction (``model.py:16-49``):
    ``left(x) · right(y) / sqrt(n_hid)``.

    The reference caches the left tower during inference but never
    invalidates the cache (``model.py:35-39`` — SURVEY.md §2 #11 flags it).
    Here caching is explicit and functional: call :meth:`left` once, reuse
    the result, and score with :meth:`score_cached`.
    """

    n_hid: int

    def setup(self):
        self.left_linear = nn.Dense(self.n_hid)
        self.right_linear = nn.Dense(self.n_hid)

    def left(self, x):
        return self.left_linear(x)

    def right(self, y):
        return self.right_linear(y)

    def score_cached(self, tx, ty, pair: bool = False):
        """Score with a precomputed left tower ``tx``."""
        if pair:
            res = jnp.sum(tx * ty, axis=-1)
        else:
            res = tx @ ty.T
        return res / jnp.sqrt(jnp.float32(self.n_hid))

    def __call__(self, x, y, pair: bool = False):
        return self.score_cached(self.left(x), self.right(y), pair=pair)
