"""Optimizers and LR schedules.

Parity targets:
- AdamW with no-weight-decay groups for biases / norms
  (``/root/reference/ogbn-mag/train_ogbn_mag.py:119-127``)
- CosineAnnealingLR(1000, eta_min=1e-6)
  (``OAG/train_paper_field.py:205-207``)
- OneCycleLR(max_lr=5e-4, pct_start=0.05, anneal_strategy='linear')
  (``ogbn-mag/train_ogbn_mag.py:128-129``)
- global-norm gradient clipping (``OAG/train_paper_field.py:251``: 0.25;
  ``ogbn-mag/train_ogbn_mag.py:57``: 1.0)
"""

from __future__ import annotations

from typing import Optional

import jax
import optax

# Parameter-name suffixes excluded from weight decay, mirroring the
# reference's ['bias', 'LayerNorm.weight'] no-decay group plus our
# scalar banks (skip gate, relation priors behave like norms/gates).
NO_DECAY_KEYS = (
    "bias", "bq", "bk", "bv", "ba", "adapt_b", "rte_b",
    "ln_scale", "ln_bias", "scale",
    "skip", "rel_pri",
)


def _decay_mask(params):
    def mask_leaf(path, _leaf):
        names = [p.key for p in path if hasattr(p, "key")]
        return not any(n in NO_DECAY_KEYS for n in names)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def cosine_schedule(
    lr: float = 1e-3, period: int = 1000, eta_min: float = 1e-6
):
    """torch CosineAnnealingLR semantics (restart-free within one period,
    clamped at the period end — reference steps it with
    ``scheduler.step(train_step)`` so we index by step)."""
    sched = optax.cosine_decay_schedule(
        init_value=lr, decay_steps=period, alpha=eta_min / lr
    )
    return sched


def onecycle_schedule(
    max_lr: float = 5e-4, total_steps: int = 1000, pct_start: float = 0.05
):
    """torch OneCycleLR(anneal_strategy='linear') semantics.

    Boundary degeneracy guard: optax floors each phase boundary to an
    integer step (``int(pct * transition_steps)``); when a phase spans
    zero whole steps the piecewise interpolation divides by zero and the
    NaN poisons EVERY learning rate (observed: total_steps=8 with
    pct_start=0.05 produced an all-NaN schedule). Boundaries are therefore
    computed in whole steps, at least one step apart.
    """
    total_steps = max(int(total_steps), 3)
    b1 = min(max(1, round(pct_start * total_steps)), total_steps - 2)
    b2 = total_steps - 1
    return optax.linear_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=b1 / total_steps,
        pct_final=b2 / total_steps,
        div_factor=25.0,
        final_div_factor=1e4,
    )


def make_optimizer(
    schedule,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = 0.25,
    params=None,
):
    """AdamW + global-norm clip, no-decay groups for biases/norms/gates.

    ``params`` (a pytree template) enables the decay mask; without it decay
    applies everywhere (fine for quick experiments).
    """
    mask = _decay_mask(params) if params is not None else None
    tx = optax.adamw(
        learning_rate=schedule,
        weight_decay=weight_decay,
        mask=mask,
        eps=1e-6,
    )
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
