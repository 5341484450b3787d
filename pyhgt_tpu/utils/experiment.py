"""Experiment helpers (parity: ``/root/reference/ogbn-mag/pyHGT/utils.py``)."""

from __future__ import annotations

import numpy as np
import jax


def get_n_params(params) -> int:
    """Total parameter count of a pytree (``utils.py:8-14``)."""
    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def args_print(args, file=None) -> None:
    """Pretty-print a config namespace/dataclass/dict as an aligned table
    (``utils.py:16-23`` uses texttable; plain formatting here)."""
    items = vars(args) if not isinstance(args, dict) else args
    width = max((len(str(k)) for k in items), default=0)
    print("\n".join(f"  {k:<{width}}  {v}" for k, v in items.items()),
          file=file)


def randint() -> int:
    """Fresh 32-bit seed — per-sampling-job RNG decorrelation
    (``pyHGT/utils.py:42-43``)."""
    return int(np.random.randint(0, 2**31 - 1))
