"""Training layer: optimizers, schedules, jit train step, prefetch pipeline,
checkpointing, metrics.

Rebuilds the reference's L4/L5 training machinery (epoch loops in
``/root/reference/OAG/train_*.py`` and ``ogbn-mag/train_ogbn_mag.py``) as a
library: one jit-compiled train step, an async sampler→device prefetch
pipeline replacing the ``mp.Pool`` double buffer
(``OAG/train_paper_field.py:214-231``), and orbax checkpoints replacing
best-model ``torch.save`` (``:277-279``).
"""

from pyhgt_tpu.train.optim import make_optimizer, cosine_schedule, onecycle_schedule
from pyhgt_tpu.train.metrics import dcg_at_k, ndcg_at_k, mean_reciprocal_rank
from pyhgt_tpu.train.step import TrainState, make_train_step, make_eval_step
from pyhgt_tpu.train.loader import PrefetchLoader

__all__ = [
    "make_optimizer",
    "cosine_schedule",
    "onecycle_schedule",
    "dcg_at_k",
    "ndcg_at_k",
    "mean_reciprocal_rank",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "PrefetchLoader",
]
