"""Dataset layer: reference-pickle conversion, feature extraction,
offline feature propagation, and the OAG / ogbn-mag preprocessors.

Parity targets: ``/root/reference/OAG/preprocess_OAG.py``,
``ogbn-mag/preprocess_ogbn_mag.py``, ``pyHGT/utils.py:23-70`` and the
``RenameUnpickler`` loader (``pyHGT/data.py:260-269``).
"""

from pyhgt_tpu.datasets.features import feature_oag, feature_mag
from pyhgt_tpu.datasets.propagate import normalize_rows, propagate_features

__all__ = [
    "feature_oag",
    "feature_mag",
    "normalize_rows",
    "propagate_features",
]
