"""Relative Temporal Encoding — the frozen sinusoidal table.

Parity with the reference ``RelTemporalEncoding``
(``/root/reference/pyHGT/conv.py:283-299``): a ``max_len``-row sinusoidal
embedding scaled by ``1/sqrt(n_hid)``, deliberately non-trainable (the
reference *intends* a frozen table — it sets ``requires_grad=False`` on the
Module at ``conv.py:295``, a quirk we implement as a true constant),
followed by a trainable Linear applied by the conv layer.

The table is a compile-time constant: built once in numpy, closed over by
the traced program, so XLA folds it into the executable.
"""

from __future__ import annotations

import numpy as np

RTE_MAX_LEN = 240  # /root/reference/pyHGT/conv.py:287


def rte_sin_table(n_hid: int, max_len: int = RTE_MAX_LEN) -> np.ndarray:
    """[max_len, n_hid] sinusoidal table, scaled by 1/sqrt(n_hid).

    Row t: even columns sin(t / 10000^(2i/n_hid)), odd columns cos(...),
    matching ``conv.py:289-293``.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(
        np.arange(0, n_hid, 2, dtype=np.float64) * -(np.log(10000.0) / n_hid)
    )
    table = np.zeros((max_len, n_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(position * div)
    table[:, 1::2] = np.cos(position * div[: (n_hid - n_hid // 2)])
    return (table / np.sqrt(n_hid)).astype(np.float32)
