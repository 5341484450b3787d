"""Composite task models: GNN + head wired for each downstream task.

The reference composes these by hand in each script
(``nn.Sequential(gnn, classifier)``, ``/root/reference/OAG/
train_paper_field.py:190-195``; GNN + Matcher in
``train_author_disambiguation.py``). Here they are modules so params /
checkpoints / sharding treat the whole task model uniformly.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from pyhgt_tpu.models.model import GNN, Classifier, Matcher
from pyhgt_tpu.ops.hgt import EdgeStaticMeta


class NodeClassifierModel(nn.Module):
    """GNN + log-softmax classifier.

    ``head_mode='seeds'``: classify the first ``n_seed`` rows of the target
    type's block (paper-field/venue pattern, seeds-first layout contract).
    ``head_mode='full'``: classify every row of the target type's block
    (ogbn-mag pattern — loss/metrics then mask by split membership).
    """

    gnn_kwargs: dict
    n_classes: int
    target_type_id: int = 0
    head_mode: str = "seeds"
    n_seed: int = 0

    def setup(self):
        self.gnn = GNN(**self.gnn_kwargs)
        self.clf = Classifier(n_out=self.n_classes)

    def __call__(
        self, node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask,
        em: EdgeStaticMeta, deterministic: bool = True, se=None, pe=None,
    ):
        h = self.gnn(
            node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask, em,
            deterministic=deterministic, se=se, pe=pe,
        )
        block = h[self.target_type_id]
        if self.head_mode == "seeds":
            block = block[: self.n_seed]
        return self.clf(block)

    def representations(
        self, node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask,
        em: EdgeStaticMeta, deterministic: bool = True, se=None, pe=None,
    ):
        return self.gnn(
            node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask, em,
            deterministic=deterministic, se=se, pe=pe,
        )


class LinkMatcherModel(nn.Module):
    """GNN + two-tower Matcher for grouped link prediction
    (author disambiguation: queries = seed papers, candidates = same-name
    authors; ``train_author_disambiguation.py:293-294``)."""

    gnn_kwargs: dict
    n_hid: int
    query_type_id: int = 0
    n_query: int = 0          # seed papers per batch (static)

    def setup(self):
        self.gnn = GNN(**self.gnn_kwargs)
        self.matcher = Matcher(n_hid=self.n_hid)

    def __call__(self, *args, **kwargs):
        return self.score_pairs(*args, **kwargs)

    def score_pairs(
        self, node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask,
        em: EdgeStaticMeta, cand_idx, deterministic: bool = True, se=None,
        pe=None,
    ):
        """[P, G] matcher scores: query papers vs per-row candidate nodes.

        Candidates go through the *left* tower (the reference caches that
        side for million-candidate serving, ``pyHGT/model.py:27-39``),
        queries through the right.
        """
        h = self.gnn(
            node_feat, edge_src, edge_tgt, edge_dt, edge_mask, node_mask, em,
            deterministic=deterministic, se=se, pe=pe,
        )
        T, C, D = h.shape
        flat = h.reshape(T * C, D)
        q = self.matcher.right(h[self.query_type_id, : self.n_query])
        cands = self.matcher.left(flat[cand_idx])          # [P, G, D]
        scores = jnp.einsum("pd,pgd->pg", q, cands)
        return scores / jnp.sqrt(jnp.float32(self.n_hid))
