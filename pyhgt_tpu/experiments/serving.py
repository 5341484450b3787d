"""Online serving: checkpoint -> warm predictor -> per-request inference.

The reference stops at offline evaluation scripts
(``/root/reference/ogbn-mag/eval_ogbn_mag.py``); its only serving-shaped
machinery is the Matcher's cached left tower for million-candidate
ranking (``pyHGT/model.py:27-39``, productized here as
:class:`pyhgt_tpu.tasks.matcher_index.MatcherIndex`). This module adds
the node-classification analogue: load a trained checkpoint once,
compile the forward once, then answer ``predict(node_ids)`` requests by
sampling subgraphs around the requested nodes (optionally
variance-reduce-averaged across resamples — the protocol behind the
reference's published number, ``eval_ogbn_mag.py:128-160``).

Exposed on the CLI as ``python -m pyhgt_tpu.run serve --data .. --ckpt ..``
(JSON-lines on stdin/stdout).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from pyhgt_tpu.config import ExperimentConfig
from pyhgt_tpu.graph.csr import CSRGraph


class OgbnPredictor:
    """Warm node-classification predictor over a trained checkpoint.

    Builds the same model/layout as training (``experiments.engine``),
    restores ``ckpt_path``, jits the forward once; ``predict_logprobs``
    accumulates per-node log-probs over ``vr_num`` independent subgraph
    resamples (vr_num=1 = one sample per request node).
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        graph: CSRGraph,
        ckpt_path: str,
        log: Callable[[str], None] = print,
    ) -> None:
        import jax

        from pyhgt_tpu.experiments.engine import (
            _infer_in_dim,
            gnn_kwargs,
            make_layout,
            make_sampler,
            make_tx,
        )
        from pyhgt_tpu.models import NodeClassifierModel
        from pyhgt_tpu.ops.hgt import EdgeStaticMeta
        from pyhgt_tpu.sampling.sorted_batch import sort_batch, sort_edges
        from pyhgt_tpu.tasks import OgbnNodeTask
        from pyhgt_tpu.train.checkpoint import load_checkpoint
        from pyhgt_tpu.train.step import TrainState

        self.cfg = cfg
        sampler = make_sampler(cfg, graph, log=log)
        self.layout = make_layout(cfg, graph)
        self.em = EdgeStaticMeta.from_layout(self.layout)
        self.task = OgbnNodeTask(
            graph=graph, sampler=sampler, layout=self.layout,
            batch_size=cfg.batch_size,
        )
        rng0 = np.random.default_rng(cfg.seed)
        tb0 = self.task.sample(np.arange(min(cfg.batch_size, 4)), rng0)
        self.model = NodeClassifierModel(
            gnn_kwargs=gnn_kwargs(cfg, self.layout, _infer_in_dim(tb0)),
            n_classes=self.task.n_classes,
            target_type_id=self.layout.schema.type_id(self.task.target_type),
            head_mode="full",
        )
        se0 = sort_batch(tb0.sub, self.layout, self.em)
        params = self.model.init(
            jax.random.key(cfg.seed), *tb0.batch_args, self.em, se=se0
        )
        template = TrainState.create(params, make_tx(cfg, params, 1))
        self.state = load_checkpoint(ckpt_path, template)

        em = self.em
        layout = self.layout
        model = self.model
        fwd = jax.jit(
            lambda p, nf, es, et, dt, emk, nmk, se: model.apply(
                p, nf, es, et, dt, emk, nmk, em, se=se
            )
        )

        def eval_forward(p, *bargs):
            nf, es, et, dt, emk, nmk = bargs
            se = sort_edges(es, et, dt, emk, layout, em)
            return fwd(p, *bargs, se)

        self.eval_forward = eval_forward

    @property
    def params(self):
        return self.state.params

    @property
    def n_classes(self) -> int:
        return self.task.n_classes

    # ------------------------------------------------------------------
    def predict_logprobs(
        self,
        node_ids: Sequence[int],
        vr_num: Optional[int] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> np.ndarray:
        """Accumulated log-probs ``[len(node_ids), n_classes]`` over
        ``vr_num`` resamples (the VR protocol; argmax of the accumulation
        is the served prediction). Extra subgraph co-members are free
        riders: any requested node appearing in another request node's
        subgraph also contributes its row."""
        vr = vr_num if vr_num is not None else max(self.cfg.vr_num, 1)
        rng = rng or np.random.default_rng(self.cfg.seed + 9)
        ids = np.asarray(node_ids, dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        acc = np.zeros((len(ids), self.n_classes), dtype=np.float64)
        bs = self.cfg.batch_size
        for s in range(0, len(ids), bs):
            chunk = ids[s : s + bs]
            for _ in range(vr):
                tb = self.task.sample(chunk, rng, split="train")
                logp = np.asarray(
                    self.eval_forward(self.params, *tb.batch_args)
                )
                tids = np.asarray(tb.target_ids)
                live = tids >= 0
                pos = np.searchsorted(sorted_ids, tids[live])
                pos = np.minimum(pos, len(ids) - 1)
                hit = sorted_ids[pos] == tids[live]
                acc[order[pos[hit]]] += logp[live][hit]
        return acc

    def predict(
        self,
        node_ids: Sequence[int],
        vr_num: Optional[int] = None,
        rng: Optional[np.random.Generator] = None,
    ) -> np.ndarray:
        """Served class ids ``[len(node_ids)]``."""
        return np.argmax(
            self.predict_logprobs(node_ids, vr_num=vr_num, rng=rng), axis=-1
        )


def serve_jsonl(
    predictor: OgbnPredictor,
    stdin=None,
    stdout=None,
    log: Callable[[str], None] = print,
) -> int:
    """JSON-lines serving loop: each request line
    ``{"nodes": [...], "vr_num": k?}`` answers with
    ``{"nodes": [...], "pred": [...], "logp": [[...]]}``."""
    import json
    import sys

    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    n = 0
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            nodes = req["nodes"]
            lp = predictor.predict_logprobs(nodes, vr_num=req.get("vr_num"))
            resp = {
                "nodes": list(map(int, nodes)),
                "pred": np.argmax(lp, axis=-1).tolist(),
                "logp": np.round(lp, 6).tolist(),
            }
        except Exception as e:  # malformed request: answer, don't die
            resp = {"error": repr(e)}
        stdout.write(json.dumps(resp) + "\n")
        stdout.flush()
        n += 1
    log(f"served {n} requests")
    return n
