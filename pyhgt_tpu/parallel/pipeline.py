"""GPipe-style pipeline parallelism for the HGT conv stack.

The reference is single-GPU (SURVEY §2.9 — no distributed code at all);
this module is the pp letter of the dp/tp/gp/pp parallelism product,
for stacks too deep for one chip (the conv stack dominates parameters
and activations; dp/tp/gp cover the other axes).

Design (scaling-book pipelining recipe, shard_map form):

- the ``n_layers`` homogeneous :class:`~pyhgt_tpu.models.conv.GeneralConv`
  parameter subtrees are stacked to ``[S, L/S, ...]`` and sharded over a
  1-D ``pipe`` mesh axis — each device owns a contiguous stage of layers;
- microbatches (= independent subgraphs, exactly the dp unit) stream
  through the stages with the classic GPipe schedule: at step ``t`` stage
  ``s`` processes microbatch ``t - s``, then hands its activation
  ``[T, C, D]`` to stage ``s+1`` with a single ``ppermute`` over ICI;
- stage 0 embeds fresh microbatches (input adapters), the last stage runs
  the classifier head + NLL; the scalar loss is ``psum`` so every device
  returns the identical value;
- ``jax.value_and_grad`` OUTSIDE the shard_map differentiates the whole
  pipelined program — the transpose of ``ppermute`` is the reverse
  ``ppermute``, so the backward pass pipelines in reverse automatically
  (same pattern as :mod:`pyhgt_tpu.parallel.spmd`).

Bubble fraction is the usual ``(S-1)/(M+S-1)`` — pick ``n_micro >= 2*S``.
Microbatch tensors are replicated along ``pipe`` for simplicity (each
stage dynamically indexes the microbatch it is working on); shard them
over a composed data axis if HBM ever binds.

Constraints: the stacked stages must be homogeneous — ``n_layers % S == 0``
and ``prev_norm == last_norm`` (the flagship recipe satisfies both; an
assert guards the rest).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pyhgt_tpu.models.conv import GeneralConv
from pyhgt_tpu.models.model import Classifier
from pyhgt_tpu.ops.hgt import typed_linear
from pyhgt_tpu.train.step import TrainState, nll_loss

PIPE_AXIS = "pipe"
DATA_AXIS = "data"


def make_pipe_mesh(n_pipe: int, n_data: int = 1, devices=None) -> Mesh:
    """``pipe`` mesh over the first ``n_pipe`` devices; ``n_data > 1``
    composes dp×pp on a 2-D ``(data, pipe)`` mesh — each data shard runs
    its own GPipe pipeline over its own microbatches, stage params are
    replicated along ``data`` (their grad cotangents psum automatically
    under shard_map), and the loss is additionally pmean'd over ``data``.
    """
    devices = list(devices if devices is not None else jax.devices())
    need = n_pipe * n_data
    if len(devices) < need:
        raise ValueError(f"pipe={n_pipe} x data={n_data} needs {need} "
                         f"devices, have {len(devices)}")
    if n_data == 1:
        return Mesh(np.asarray(devices[:n_pipe]), (PIPE_AXIS,))
    return Mesh(
        np.asarray(devices[:need]).reshape(n_data, n_pipe),
        (DATA_AXIS, PIPE_AXIS),
    )


def stack_pipeline_params(params, n_layers: int, n_stages: int):
    """Task-model flax tree -> ``{"stages": [S, L/S, ...], "shared"}``.

    Works for any composite with a ``gnn`` submodule holding ``convs_i``
    subtrees (FlagshipModel, NodeClassifierModel, LinkMatcherModel):
    ``stages`` stacks the conv subtrees (identical structure — homogeneous
    norm config required); ``shared`` carries the input adapters plus
    every non-``gnn`` head subtree (clf / matcher), replicated on every
    stage (tiny)."""
    if n_layers % n_stages:
        raise ValueError(f"n_layers={n_layers} not divisible by "
                         f"n_stages={n_stages}")
    p = params["params"]
    convs = [p["gnn"][f"convs_{i}"] for i in range(n_layers)]
    per_layer = n_layers // n_stages
    stages = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(
            (n_stages, per_layer) + xs[0].shape
        ),
        *convs,
    )
    shared = {
        "adapt_w": p["gnn"]["adapt_w"],
        "adapt_b": p["gnn"]["adapt_b"],
    }
    for k, v in p.items():
        if k != "gnn":
            shared[k] = v
    return {"stages": stages, "shared": shared}


def unstack_pipeline_params(pp_params, n_layers: int):
    """Inverse of :func:`stack_pipeline_params` (checkpoint export /
    single-device eval)."""
    stages = pp_params["stages"]
    shared = pp_params["shared"]
    flat = jax.tree.map(
        lambda a: a.reshape((n_layers,) + a.shape[2:]), stages
    )
    gnn = {
        "adapt_w": shared["adapt_w"],
        "adapt_b": shared["adapt_b"],
    }
    for i in range(n_layers):
        gnn[f"convs_{i}"] = jax.tree.map(lambda a: a[i], flat)
    heads = {k: v for k, v in shared.items()
             if k not in ("adapt_w", "adapt_b")}
    return {"params": {"gnn": gnn, **heads}}


def pipeline_param_shardings(pp_params, mesh: Mesh):
    """stages sharded over ``pipe`` on axis 0, shared replicated."""
    stage_sh = NamedSharding(mesh, P(PIPE_AXIS))
    rep = NamedSharding(mesh, P())
    return {
        "stages": jax.tree.map(lambda _: stage_sh, pp_params["stages"]),
        "shared": jax.tree.map(lambda _: rep, pp_params["shared"]),
    }


def _dropout(x, rate: float, key, deterministic: bool):
    if deterministic or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def make_pp_task_loss(conv_kwargs: dict, dims, em, head_loss,
                      n_stages: int, n_micro: int, mesh: Mesh,
                      dropout: float, deterministic: bool = False):
    """Task-generic collective pipelined loss
    ``loss(stages, shared, rng, micro_args, se_stack, labels) -> scalar``.

    ``conv_kwargs``: :class:`~pyhgt_tpu.models.conv.GeneralConv` kwargs
    for ONE layer (``use_norm`` already resolved — the stack must be
    homogeneous). ``dims = (num_types, node_cap, n_hid)`` sizes the
    bootstrap activation. ``head_loss(shared, h_out, m_idx, labels)``
    computes the task loss for microbatch ``m_idx`` from the last-stage
    activation ``h_out [T, C, D]`` and the stacked labels pytree —
    classifier + KL/NLL for the node tasks, matcher scoring for links.

    ``micro_args`` are the 6 batch arrays with a leading ``[M]``
    microbatch axis, ``se_stack`` the same for the SortedEdges pytree.
    All replicated along ``pipe``; the stage params arrive sharded. The
    returned callable must run under ``jit`` (it contains a shard_map).

    On a 2-D ``(data, pipe)`` mesh (dp×pp, :func:`make_pipe_mesh` with
    ``n_data > 1``) the microbatch leading axis must be ``[Dp*M]`` — it is
    sharded over ``data`` so each data shard pipelines its own ``M``
    microbatches; the returned loss is the mean over all ``Dp*M``."""
    has_dp = DATA_AXIS in mesh.axis_names
    data_spec = P(DATA_AXIS) if has_dp else P()
    conv = GeneralConv(**conv_kwargs)
    num_types, node_cap, n_hid = dims
    S, M = n_stages, n_micro
    rate = dropout
    perm = [(i, (i + 1) % S) for i in range(S)]

    def pick(tree, idx):
        return jax.tree.map(
            lambda a: lax.dynamic_index_in_dim(a, idx, 0, keepdims=False),
            tree,
        )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(), P(), data_spec, data_spec, data_spec),
        out_specs=P(),
        check_vma=False,
    )
    def collective_loss(stages_local, shared, rng, micro, se_stack, labels):
        # [1, L/S, ...] local shard -> [L/S, ...]
        stage_layers = jax.tree.map(lambda a: a[0], stages_local)
        s = lax.axis_index(PIPE_AXIS)
        if has_dp:  # decorrelate dropout across data shards
            rng = jax.random.fold_in(rng, lax.axis_index(DATA_AXIS))
        nf_all, es_all, et_all, dt_all, emk_all, nmk_all = micro

        def embed(m_idx, key):
            nf = lax.dynamic_index_in_dim(nf_all, m_idx, 0, keepdims=False)
            nmk = lax.dynamic_index_in_dim(nmk_all, m_idx, 0, keepdims=False)
            h = jnp.tanh(
                typed_linear(nf, shared["adapt_w"], shared["adapt_b"])
            )
            h = _dropout(h, rate, key, deterministic)
            return h * nmk[..., None]

        def stage_compute(h_in, m_idx, key):
            args = tuple(
                lax.dynamic_index_in_dim(a, m_idx, 0, keepdims=False)
                for a in (es_all, et_all, dt_all, emk_all, nmk_all)
            )
            se_m = pick(se_stack, m_idx)

            def layer(h, xs):
                lp, li = xs
                h = conv.apply(
                    {"params": lp}, h, *args, em,
                    deterministic=deterministic, se=se_m,
                    rngs=(None if deterministic
                          else {"dropout": jax.random.fold_in(key, li)}),
                )
                return h, None

            n_local = jax.tree.leaves(stage_layers)[0].shape[0]
            h_out, _ = lax.scan(
                layer, h_in, (stage_layers, jnp.arange(n_local))
            )
            return h_out

        h0 = jnp.zeros((num_types, node_cap, n_hid), jnp.float32)

        def step_fn(carry, t):
            h_recv, acc = carry
            m = t - s
            m_c = jnp.clip(m, 0, M - 1)
            valid = (m >= 0) & (m < M)
            key_m = jax.random.fold_in(jax.random.fold_in(rng, m_c), s)
            h_in = jnp.where(
                s == 0, embed(m_c, jax.random.fold_in(key_m, 97)), h_recv
            )
            h_out = stage_compute(h_in, m_c, key_m)
            l_m = head_loss(shared, h_out, m_c, labels)
            acc = acc + jnp.where(valid & (s == S - 1), l_m, 0.0)
            h_next = lax.ppermute(h_out, PIPE_AXIS, perm)
            return (h_next, acc), None

        (_, acc), _ = lax.scan(
            step_fn, (h0, jnp.float32(0.0)), jnp.arange(M + S - 1)
        )
        # acc is nonzero only on the last stage; psum replicates the
        # mean-over-microbatches loss to every device
        loss = lax.psum(acc, PIPE_AXIS) / M
        if has_dp:
            loss = lax.pmean(loss, DATA_AXIS)
        return loss

    return collective_loss


def make_pp_loss(fl, n_stages: int, n_micro: int, mesh: Mesh,
                 deterministic: bool = False):
    """Flagship wiring of :func:`make_pp_task_loss`: homogeneous-norm HGT
    stack + Classifier head + NLL over the paper seeds. Returns
    ``loss(stages, shared, rng, micro_args, se_stack, labels) -> scalar``
    with ``labels [M, n_seed]``."""
    c = fl.cfg
    if c.n_layers % n_stages:
        raise ValueError(f"n_layers={c.n_layers} % n_stages={n_stages}")
    conv_kwargs = dict(
        conv_name="hgt", in_dim=c.n_hid, out_dim=c.n_hid,
        num_types=fl.schema.num_types,
        num_relations=fl.schema.num_relations,
        n_heads=c.n_heads, dropout=c.dropout,
        # homogeneous stack: FlagshipModel uses prev_norm=last_norm=True
        use_norm=True, use_rte=True, remat=c.remat,
        edge_impl=c.edge_impl, save_kv=c.save_kv, edge_bf16=c.edge_bf16,
        edge_bwd=c.edge_bwd, seg_pallas=c.seg_pallas,
        softmax_pallas=c.softmax_pallas, graph_axis="",
    )
    clf = Classifier(n_out=c.n_classes)
    n_seed = c.n_seed

    def head_loss(shared, h_out, m_idx, labels):
        logp = clf.apply({"params": shared["clf"]}, h_out[0, :n_seed])
        y_m = lax.dynamic_index_in_dim(labels, m_idx, 0, keepdims=False)
        return nll_loss(logp, y_m)

    return make_pp_task_loss(
        conv_kwargs, (fl.layout.num_types, fl.layout.node_cap, c.n_hid),
        fl.em, head_loss, n_stages, n_micro, mesh, c.dropout,
        deterministic=deterministic,
    )


def make_pp_train_step(
    fl,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    n_micro: int,
    deterministic: bool = False,
    donate: bool = True,
):
    """Build ``step(state, rng, micro_args, se_stack, labels) ->
    (state, loss)`` over a ``pipe`` mesh. ``state.params`` must be in
    pipeline form (:func:`stack_pipeline_params`, device_put with
    :func:`pipeline_param_shardings`)."""
    n_stages = mesh.shape[PIPE_AXIS]
    loss_fn = make_pp_loss(
        fl, n_stages, n_micro, mesh, deterministic=deterministic
    )

    def step(state: TrainState, rng, micro, se_stack, labels):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(
                p["stages"], p["shared"], rng, micro, se_stack, labels
            )
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            loss,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())
