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
    max_lr: float = 5e-4,
    total_steps: int = 1000,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 10.0,
):
    """torch OneCycleLR(anneal_strategy='linear', three_phase=False)
    semantics, matching the reference's exact knobs
    (``ogbn-mag/train_ogbn_mag.py:128-129``: pct_start=0.05,
    final_div_factor=10, total_steps=n_batch*n_epoch+1).

    torch's two-phase linear cycle rises from ``max_lr/div_factor`` to
    ``max_lr`` over ``float(pct_start*total_steps) - 1`` steps (a
    *fractional* boundary — torch never lands exactly on the peak when it
    isn't integral), then decays linearly to
    ``max_lr/(div_factor*final_div_factor)`` over the remainder. optax's
    ``linear_onecycle_schedule`` is 3-phase with integer boundaries and
    decays only to ``max_lr/div_factor`` before a final cliff — up to
    ~1e4x larger late-training LR — so the formula is implemented
    directly. Phase lengths are floored at a tiny positive value so tiny
    ``total_steps`` can never divide by zero (round-1 NaN regression).
    """
    import jax.numpy as jnp

    total_steps = max(int(total_steps), 2)
    up = max(float(pct_start * total_steps) - 1.0, 1e-9)
    down = max(float(total_steps) - up - 1.0, 1e-9)
    init = max_lr / div_factor
    final = init / final_div_factor

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        lr_up = init + (max_lr - init) * jnp.clip(s / up, 0.0, 1.0)
        lr_down = max_lr + (final - max_lr) * jnp.clip((s - up) / down, 0.0, 1.0)
        return jnp.where(s <= up, lr_up, lr_down)

    return schedule


def make_optimizer(
    schedule,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = 0.25,
    params=None,
    name: str = "adamw",
):
    """Optimizer factory + global-norm clip.

    ``name`` mirrors the reference's ``--optimizer`` choices
    (``OAG/train_paper_field.py:42-44,198-205``): adamw (no-decay groups
    for biases/norms/gates), adam, sgd (the reference pins lr=0.1 and
    ignores the scheduler's base — we keep the schedule but that quirk is
    documented), adagrad. ``params`` (a pytree template) enables the
    adamw decay mask; without it decay applies everywhere.
    """
    if name == "adamw":
        mask = _decay_mask(params) if params is not None else None
        tx = optax.adamw(
            learning_rate=schedule,
            weight_decay=weight_decay,
            mask=mask,
            eps=1e-6,
        )
    elif name == "adam":
        tx = optax.adam(learning_rate=schedule)
    elif name == "sgd":
        tx = optax.sgd(learning_rate=schedule)
    elif name == "adagrad":
        tx = optax.adagrad(learning_rate=schedule)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
