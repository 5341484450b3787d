"""jit-compiled train/eval steps.

Replaces the reference epoch-loop bodies (forward → loss → backward → clip →
step → scheduler, ``/root/reference/OAG/train_paper_field.py:240-256``) with
one traced XLA program. Loss functions mirror the three task heads:

- ``kl_div``  multi-label soft targets + log-softmax outputs
  (``nn.KLDivLoss(reduction='batchmean')``, ``OAG/train_paper_field.py:87``)
- ``nll``     single-label (``nn.NLLLoss``, ``OAG/train_paper_venue.py:86``,
  ``ogbn-mag/train_ogbn_mag.py:116``)
- grouped listwise softmax for link prediction lives in the task layer
  (``mask_softmax``, ``OAG/train_author_disambiguation.py:90-96``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    """Minimal functional train state: params + optimizer state + step."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def kl_div_loss(log_probs, soft_targets, mask=None):
    """KLDivLoss(reduction='batchmean') semantics: sum over classes of
    t * (log t - log p), averaged over batch rows. Rows with all-zero
    targets contribute 0 (the reference normalizes labels to sum 1)."""
    t = soft_targets
    safe_log_t = jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-30)), 0.0)
    per_row = jnp.sum(t * (safe_log_t - log_probs), axis=-1)
    if mask is not None:
        per_row = per_row * mask
        return jnp.sum(per_row) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(per_row)


def nll_loss(log_probs, labels, mask=None):
    """NLLLoss on log-probabilities."""
    per_row = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    if mask is not None:
        per_row = per_row * mask
        return jnp.sum(per_row) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.mean(per_row)


def make_train_step(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
):
    """Build ``step(state, rng, *batch) -> (state, loss)``.

    ``loss_fn(params, rng, *batch)`` must return a scalar. The returned
    function is jit-compiled with the state donated (in-place param update
    in HBM — no copy of the 21M-param bank per step).
    """

    def step(state: TrainState, rng, *batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rng, *batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step_acc(
    loss_fn: Callable[..., jnp.ndarray],
    tx: optax.GradientTransformation,
    donate: bool = True,
):
    """Gradient-accumulation variant of :func:`make_train_step`.

    ``step(state, rng, *stacked_batch) -> (state, mean_loss)`` where every
    batch argument carries a leading accumulation axis ``A``: grads are
    averaged over the ``A`` microbatches inside one jit program, then the
    optimizer applies once. One dispatch + one optimizer apply amortized
    over ``A`` batches (the reference's ``--repeat`` reuses batches,
    ``OAG/train_paper_field.py:240``; this instead packs *distinct*
    batches per step). Microbatches run through ``lax.scan`` so each slice
    executes the unbatched program — vmap with a batched leading axis
    turns the edge gathers into batched gathers (+20% measured,
    docs/PERF_NOTES.md).
    """

    def step(state: TrainState, rng, *batch):
        n_acc = jax.tree_util.tree_leaves(batch[0])[0].shape[0]
        rngs = jax.random.split(rng, n_acc)

        def body(carry, xs):
            r = xs[0]
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, r, *xs[1:]
            )
            acc_loss, acc_g = carry
            return (acc_loss + loss, jax.tree.map(jnp.add, acc_g, grads)), None

        zero = (
            jnp.zeros((), jnp.float32),
            jax.tree.map(lambda p: jnp.zeros_like(p), state.params),
        )
        (loss_sum, g_sum), _ = jax.lax.scan(body, zero, (rngs, *batch))
        grads = jax.tree.map(lambda g: g / n_acc, g_sum)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss_sum / n_acc,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(forward: Callable[..., Any]):
    """jit a pure forward for evaluation (deterministic=True path)."""
    return jax.jit(forward)
