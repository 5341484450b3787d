"""Checkpoint / resume.

The reference only saves the best-valid model (whole pickled module,
``/root/reference/OAG/train_paper_field.py:277-279``; ``state_dict`` on
ogbn-mag, ``train_ogbn_mag.py:196-198``) and cannot resume optimizer/step.
Here the full train state (params + opt_state + step + loader seed) is
checkpointed with orbax, keeping the best-valid policy as a library helper.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is baked into the image
    _HAS_ORBAX = False


def save_checkpoint(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (e.g. TrainState) to ``path`` (a directory)."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=force)
        ckptr.wait_until_finished()
    else:  # pragma: no cover
        import pickle

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`. ``template`` is a
    matching pytree (e.g. a freshly created TrainState) providing structure
    and dtypes."""
    path = os.path.abspath(path)
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    else:  # pragma: no cover
        import pickle

        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)


class BestCheckpointPolicy:
    """Save-on-best-valid, mirroring the reference epoch loop
    (``OAG/train_paper_field.py:270-280``): call :meth:`update` with each
    epoch's validation score; the state is saved only when it improves."""

    def __init__(self, path: str, mode: str = "max") -> None:
        self.path = path
        self.mode = mode
        self.best: Optional[float] = None

    def update(self, score: float, state: Any) -> bool:
        better = (
            self.best is None
            or (self.mode == "max" and score > self.best)
            or (self.mode == "min" and score < self.best)
        )
        if better:
            self.best = float(score)
            save_checkpoint(self.path, state)
        return better
