"""shard_map data-parallel train step.

The vmap-over-stacked-subgraphs dp form compiles *batched* gathers even
when each device's local batch is 1, costing ~20% on the edge stage
(measured on v5e). This step instead shard_maps the **unbatched** program
over the ``data`` axis: each device runs the single-subgraph code path,
losses ``pmean`` over ICI, and the shard_map transpose psums the
(replicated) parameter gradients.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pyhgt_tpu.parallel.mesh import DATA_AXIS
from pyhgt_tpu.train.step import TrainState


def make_gp_train_step(
    loss_single,
    tx: optax.GradientTransformation,
    mesh,
    dp: int = 1,
    donate: bool = True,
):
    """Edge-partitioned (graph-axis) train step — the SP-analogue scale-out
    for one OVERSIZED subgraph (SURVEY §2.9/§5: the graph has no sequence
    axis; its context-parallel equivalent splits each relation's sorted
    edge array into contiguous per-device slices).

    ``loss_single(params, rng, *args)`` is the single-device loss where
    exactly one positional arg is a
    :class:`pyhgt_tpu.parallel.edge_partition.PartitionedEdges` (leading
    [P] axis, P = graph-axis size); inside shard_map it receives the
    local slice. Activations are replicated along 'graph' by construction
    (the partitioned conv psums softmax stats + aggregations per layer
    over ICI), so the loss is identical on every graph shard and the
    dropout rng is shared along it — NOT folded as along 'data'.

    ``dp > 1`` composes with data parallelism on the same mesh: the
    non-edge batch args carry a leading [dp] axis (sharded over 'data'),
    the PartitionedEdges leaves carry [dp, P, ...] (sharded over
    ('data', 'graph')), losses pmean over 'data'.
    """
    from pyhgt_tpu.parallel.edge_partition import PartitionedEdges
    from pyhgt_tpu.parallel.mesh import GRAPH_AXIS

    rest_spec = P(DATA_AXIS) if dp > 1 else P()
    pe_spec = P(DATA_AXIS, GRAPH_AXIS) if dp > 1 else P(GRAPH_AXIS)

    def step(state: TrainState, rng, *batch):
        pe_idx = [
            i for i, a in enumerate(batch) if isinstance(a, PartitionedEdges)
        ]
        if len(pe_idx) != 1:
            raise ValueError(
                f"expected exactly one PartitionedEdges arg, got {len(pe_idx)}"
            )
        (pe_idx,) = pe_idx
        rest = tuple(a for i, a in enumerate(batch) if i != pe_idx)
        pe = batch[pe_idx]

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), rest_spec, pe_spec),
            out_specs=P(),
            check_vma=False,
        )
        def sharded_loss(params, rng_, rest_, pe_):
            if dp > 1:
                rest_ = jax.tree.map(lambda a: a[0], rest_)
                local = jax.tree.map(lambda a: a[0, 0], pe_)
                rng_ = jax.random.fold_in(
                    rng_, jax.lax.axis_index(DATA_AXIS)
                )
            else:
                local = jax.tree.map(lambda a: a[0], pe_)
            args = list(rest_)
            args.insert(pe_idx, local)
            loss = loss_single(params, rng_, *args)
            return jax.lax.pmean(loss, DATA_AXIS) if dp > 1 else loss

        loss, grads = jax.value_and_grad(
            lambda p: sharded_loss(p, rng, rest, pe)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_dp_train_step(
    loss_single,
    tx: optax.GradientTransformation,
    mesh,
    donate: bool = True,
):
    """Build ``step(state, rng, *stacked_batch) -> (state, loss)``.

    ``loss_single(params, rng, *batch_args)`` is the unbatched loss;
    ``stacked_batch`` leaves carry a leading axis equal to the data-axis
    size (device_put them with a ``P('data')`` sharding). Per-shard
    dropout rngs derive from ``fold_in(rng, axis_index)``.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    def sharded_loss(params, rng, batch):
        local = jax.tree.map(lambda a: a[0], batch)
        rng_s = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        loss = loss_single(params, rng_s, *local)
        return jax.lax.pmean(loss, DATA_AXIS)

    def step(state: TrainState, rng, *batch):
        loss, grads = jax.value_and_grad(
            lambda p: sharded_loss(p, rng, batch)
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
