"""Experiment runners — the reference's four training scripts as library
functions + one CLI (``python -m pyhgt_tpu.run``).

Parity targets: ``/root/reference/OAG/train_paper_field.py``,
``train_paper_venue.py``, ``train_author_disambiguation.py``,
``ogbn-mag/train_ogbn_mag.py``, ``eval_ogbn_mag.py``.
"""

from pyhgt_tpu.experiments.engine import (
    OAG_SPLITS,
    run_node_classification,
    run_ogbn,
    run_author_disambiguation,
)

__all__ = [
    "OAG_SPLITS",
    "run_node_classification",
    "run_ogbn",
    "run_author_disambiguation",
]
