"""Utility layer: experiment helpers + synthetic batch generation.

Parity with the reference's ``pyHGT/utils.py`` extras
(``ogbn-mag/pyHGT/utils.py:8-23``: ``get_n_params``, ``args_print``);
ranking metrics live in :mod:`pyhgt_tpu.train.metrics`, sparse feature
propagation in :mod:`pyhgt_tpu.datasets.propagate`.
"""

from pyhgt_tpu.utils.experiment import get_n_params, args_print, randint
from pyhgt_tpu.utils.synth import synth_batch, synth_labels

__all__ = ["get_n_params", "args_print", "randint", "synth_batch", "synth_labels"]
