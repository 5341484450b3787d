"""Sampling-based evaluation: variance-reduce & sequential modes.

Parity with ``/root/reference/ogbn-mag/eval_ogbn_mag.py``:

- **variance_reduce** (``:128-160``): resample each test batch ``vr_num``
  times with different sampler seeds, run the (deterministic) forward, and
  accumulate per-node log-prob predictions across resamples; the final
  prediction per node is the argmax of the accumulated scores. This
  multi-sample averaging produced the published 0.5007 (``README.md:28``).
- **sequential** (``:163-179``): one sample per test batch.

Both are expressed through one function; ``vr_num=1`` = sequential.
Sampling runs on host threads (PrefetchLoader) while the chip evaluates —
the same overlap the reference gets from its mp.Pool.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def multi_sample_eval(
    forward: Callable,       # jitted (params, *batch_args) -> [C, n_classes] logp
    params,
    task,                    # OgbnNodeTask-like: .sample/.y/.masks/.n_classes
    split: str = "test",
    batch_size: int = 128,
    vr_num: int = 8,
    rng: Optional[np.random.Generator] = None,
    max_nodes: Optional[int] = None,
    shuffle: bool = True,
) -> dict:
    """Returns {'acc': float, 'n_eval': int, 'per_sample_acc': [float]}.

    ``per_sample_acc`` tracks the running single-sample accuracy, so the VR
    uplift over sequential eval is visible (reference README table).
    """
    rng = rng or np.random.default_rng()
    nodes = np.where(task.masks[split])[0]
    if shuffle:
        nodes = nodes[rng.permutation(len(nodes))]
    if max_nodes is not None:
        nodes = nodes[:max_nodes]

    n_classes = task.n_classes
    acc_scores = np.zeros((task.y.shape[0], n_classes), dtype=np.float64)
    seen = np.zeros(task.y.shape[0], dtype=bool)
    single_hits, single_total = 0, 0

    for s in range(0, len(nodes), batch_size):
        papers = nodes[s : s + batch_size]
        for _ in range(vr_num):
            tb = task.sample(papers, rng, split=split)
            logp = np.asarray(forward(params, *tb.batch_args))
            live = np.asarray(tb.label_mask)
            ids = np.asarray(tb.target_ids)[live]
            rows = logp[live]
            np.add.at(acc_scores, ids, rows)
            seen[ids] = True
            single_hits += int(
                (np.argmax(rows, -1) == np.asarray(tb.labels)[live]).sum()
            )
            single_total += int(live.sum())

    eval_ids = np.where(seen)[0]
    pred = np.argmax(acc_scores[eval_ids], axis=-1)
    acc = float((pred == task.y[eval_ids]).mean()) if len(eval_ids) else 0.0
    return {
        "acc": acc,
        "n_eval": int(len(eval_ids)),
        "single_sample_acc": single_hits / max(single_total, 1),
    }
