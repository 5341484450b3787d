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
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

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


def cosine_torch_schedule(
    lr: float = 1e-3,
    period: int = 1000,
    eta_min: float = 1e-6,
    start_step: int = 1500,
):
    """EXACT torch ``CosineAnnealingLR`` closed-form semantics as the
    reference drives it: ``scheduler.step(train_step)`` with
    ``train_step`` starting at 1500 (``OAG/train_paper_field.py:205-212``,
    ``:256``), i.e. ``eta_min + (lr - eta_min) * (1 + cos(pi * t /
    period)) / 2`` evaluated at ``t = start_step + step`` — the curve
    OSCILLATES past the period end (torch's cos does not clamp) and the
    run begins mid-cycle at the 1500/1000 phase. :func:`cosine_schedule`
    (the default) is the documented deviation that clamps at the period
    end and starts at phase 0; select ``--scheduler cosine_torch`` to
    reproduce the reference's OAG training dynamics exactly."""

    def schedule(step):
        t = jnp.asarray(step, jnp.float32) + float(start_step)
        return eta_min + (lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t / float(period))
        )

    return schedule


def onecycle_schedule(
    max_lr: float = 5e-4,
    total_steps: int = 1000,
    pct_start: float = 0.05,
    div_factor: float = 25.0,
    final_div_factor: float = 10.0,
    anneal: str = "linear",
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

    def interp(start, end, pct):
        if anneal == "cos":
            # torch anneal_strategy='cos': half-cosine per phase
            return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))
        return start + (end - start) * pct

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        lr_up = interp(init, max_lr, jnp.clip(s / up, 0.0, 1.0))
        lr_down = interp(max_lr, final, jnp.clip((s - up) / down, 0.0, 1.0))
        return jnp.where(s <= up, lr_up, lr_down)

    return schedule


def bf16_param_cast(params):
    """Compute-dtype view of the parameter tree: weight banks in bf16,
    numerics-sensitive leaves (biases, norms, gates, priors — the
    NO_DECAY_KEYS set) kept f32. Masters stay f32 in the train state; the
    cast is differentiable, so grads arrive back in f32. Used by the
    ``param_bf16`` knob (halves parameter HBM reads per fwd+bwd; measure
    on-chip, keep only if it wins)."""
    import jax.numpy as jnp

    mask = _decay_mask(params)
    return jax.tree.map(
        lambda m, p: p.astype(jnp.bfloat16) if m else p, mask, params
    )


def fused_adamw(
    schedule,
    params,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = 0.25,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
):
    """Flattened-vector AdamW + global-norm clip, exactly matching
    ``chain(clip_by_global_norm, adamw(mask=_decay_mask))``.

    The per-tensor optax chain emits ~6 tiny fused kernels per parameter
    leaf; at 20.7M params spread over hundreds of banks the optimizer
    measured ~8.5 ms/step — pure many-small-tensor overhead
    (docs/PERF_NOTES.md, probe6 step decomposition). Here grads are
    raveled once into a single [N] vector, the clip norm / moments /
    decoupled weight decay run as a handful of wide vector ops (the decay
    mask is a precomputed 0/1 [N] constant), and the update is unraveled
    back to the pytree. HBM traffic is ~7 passes over 83 MB ≈ 1 ms at
    bandwidth; everything else fuses.

    Requires a homogeneous-dtype f32 params tree (ours is); raises
    otherwise so callers fall back to the per-tensor chain.
    """
    # check per-leaf: ravel_pytree PROMOTES mixed trees to the result dtype,
    # so a flat-vector dtype check misses e.g. {f32 weights, bf16 leaves}
    bad = {
        str(leaf.dtype)
        for leaf in jax.tree.leaves(params)
        if leaf.dtype != jnp.float32
    }
    if bad:
        raise TypeError(
            f"fused_adamw needs an all-f32 params tree, got {sorted(bad)}"
        )
    mask_tree = _decay_mask(params)
    mask_vec, _ = ravel_pytree(
        jax.tree.map(
            lambda m, p: jnp.full(jnp.shape(p), float(m), jnp.float32),
            mask_tree,
            params,
        )
    )

    def init(params):
        flat, _ = ravel_pytree(params)
        # mu/nu must be DISTINCT buffers: train steps donate the state, and
        # aliased leaves trip "donate the same buffer twice" in Execute()
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jnp.zeros_like(flat),
            "nu": jnp.zeros_like(flat),
        }

    def update(grads, state, params):
        g, unravel = ravel_pytree(grads)
        p, _ = ravel_pytree(params)
        if clip_norm is not None:
            gnorm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, clip_norm / jnp.maximum(gnorm, 1e-16))
        count = state["count"] + 1
        mu = b1 * state["mu"] + (1.0 - b1) * g
        nu = b2 * state["nu"] + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        lr = schedule(state["count"]) if callable(schedule) else schedule
        upd = -lr * (
            mu_hat / (jnp.sqrt(nu_hat) + eps) + weight_decay * mask_vec * p
        )
        return unravel(upd), {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


def make_optimizer(
    schedule,
    weight_decay: float = 0.01,
    clip_norm: Optional[float] = 0.25,
    params=None,
    name: str = "adamw",
    fused: bool = False,
):
    """Optimizer factory + global-norm clip.

    ``name`` mirrors the reference's ``--optimizer`` choices
    (``OAG/train_paper_field.py:42-44,198-205``): adamw (no-decay groups
    for biases/norms/gates), adam, sgd (the reference pins lr=0.1 and
    ignores the scheduler's base — we keep the schedule but that quirk is
    documented), adagrad. ``params`` (a pytree template) enables the
    adamw decay mask; without it decay applies everywhere. ``fused``
    selects the flattened-vector AdamW (same math, one wide kernel chain
    instead of hundreds of tiny ones — see :func:`fused_adamw`); it
    silently falls back to the per-tensor chain when preconditions fail.
    """
    if name == "adamw" and fused and params is not None:
        try:
            return fused_adamw(
                schedule, params, weight_decay=weight_decay,
                clip_norm=clip_norm,
            )
        except TypeError:
            pass
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
