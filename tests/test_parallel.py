"""SPMD tests on the 8-device virtual CPU mesh (SURVEY.md §4 item 4):
sharded execution must match single-device results exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
from pyhgt_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicate,
)
from pyhgt_tpu.train.optim import make_optimizer
from pyhgt_tpu.train.step import TrainState, make_train_step


@pytest.fixture(scope="module")
def env():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    fl = build_flagship("dryrun")
    batches, labels, ses = [], [], []
    for i in range(4):
        b, y = synth_flagship_batch(fl, seed=i)
        batches.append(b)
        labels.append(y)
        ses.append(fl.sort(b))
    stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    se_stack = jax.tree.map(lambda *xs: np.stack(xs), *ses)
    y = np.stack(labels)
    params = fl.init_params(jax.random.key(0), batches[0], ses[0])
    return fl, stack, se_stack, y, params


def _loss_value(fl, params, stack, se_stack, y, mesh=None, n_model=1):
    loss_fn = fl.loss_fn()
    rng = jax.random.key(7)
    if mesh is None:
        return float(loss_fn(params, rng, *fl.batch_args(stack), se_stack, y))
    with mesh:
        p = jax.device_put(params, param_shardings(params, mesh))
        bs = batch_sharding(mesh)
        args = tuple(jax.device_put(a, bs) for a in fl.batch_args(stack))
        se_d = jax.device_put(se_stack, bs)
        yd = jax.device_put(y, bs)
        rngd = jax.device_put(rng, replicate(mesh))
        return float(jax.jit(loss_fn)(p, rngd, *args, se_d, yd))


def test_dp_loss_matches_single_device(env):
    fl, stack, se_stack, y, params = env
    single = _loss_value(fl, params, stack, se_stack, y)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    sharded = _loss_value(fl, params, stack, se_stack, y, mesh)
    assert single == pytest.approx(sharded, rel=1e-5)


def test_dp_tp_loss_matches_single_device(env):
    fl, stack, se_stack, y, params = env
    single = _loss_value(fl, params, stack, se_stack, y)
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    sharded = _loss_value(fl, params, stack, se_stack, y, mesh)
    assert single == pytest.approx(sharded, rel=1e-5)


def test_dp_tp_train_step_matches(env):
    """One full train step under dp×tp == single-device step (params close)."""
    fl, stack, se_stack, y, params = env
    tx = make_optimizer(1e-2, weight_decay=0.0, clip_norm=0.25, params=params)
    loss_fn = fl.loss_fn()
    rng = jax.random.key(3)

    # single device
    state0 = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx, donate=False)
    s1, l1 = step(state0, rng, *fl.batch_args(stack), se_stack, y)

    # dp x tp
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    with mesh:
        ps = param_shardings(params, mesh)
        state = TrainState.create(jax.device_put(params, ps), tx)
        bs = batch_sharding(mesh)
        args = tuple(jax.device_put(a, bs) for a in fl.batch_args(stack))
        se_d = jax.device_put(se_stack, bs)
        yd = jax.device_put(y, bs)
        s2, l2 = step(state, jax.device_put(rng, replicate(mesh)), *args, se_d, yd)
    assert float(l1) == pytest.approx(float(l2), rel=1e-5)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    flat2 = jax.tree_util.tree_leaves(jax.device_get(s2.params))
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


@pytest.fixture(scope="module")
def pp_env():
    """dropout=0 flagship + 3 microbatches for pipeline parity (dropout
    masks cannot match between one full-stack apply and staged applies,
    so parity is pinned at rate 0)."""
    fl = build_flagship("dryrun", dropout=0.0)
    batches, labels, ses = [], [], []
    for i in range(3):
        b, y = synth_flagship_batch(fl, seed=10 + i)
        batches.append(b)
        labels.append(y)
        ses.append(fl.sort(b))
    stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    se_stack = jax.tree.map(lambda *xs: np.stack(xs), *ses)
    y = np.stack(labels)
    params = fl.init_params(jax.random.key(0), batches[0], ses[0])
    return fl, stack, se_stack, y, params


def test_pipeline_param_roundtrip(pp_env):
    from pyhgt_tpu.parallel.pipeline import (
        stack_pipeline_params,
        unstack_pipeline_params,
    )

    fl, _, _, _, params = pp_env
    pp = stack_pipeline_params(params, fl.cfg.n_layers, 2)
    back = unstack_pipeline_params(pp, fl.cfg.n_layers)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_loss_and_grads_match_sequential(pp_env):
    """GPipe pipeline over a 2-stage 'pipe' mesh == mean of sequential
    per-microbatch losses, values AND grads (SURVEY §4 item 4 pattern)."""
    from pyhgt_tpu.parallel.pipeline import (
        make_pipe_mesh,
        make_pp_loss,
        pipeline_param_shardings,
        stack_pipeline_params,
    )

    fl, stack, se_stack, y, params = pp_env
    loss_single = fl.loss_fn_single()
    rng = jax.random.key(11)

    def seq_loss(p):
        losses = [
            loss_single(
                p, rng,
                *[jax.tree.map(lambda a: a[m], x) for x in fl.batch_args(stack)],
                jax.tree.map(lambda a: a[m], se_stack),
                y[m],
            )
            for m in range(3)
        ]
        return sum(losses) / 3

    expected = float(seq_loss(params))
    g_seq = jax.grad(seq_loss)(params)
    g_seq_pp = stack_pipeline_params(g_seq, fl.cfg.n_layers, 2)

    mesh = make_pipe_mesh(2)
    loss_fn = make_pp_loss(fl, 2, 3, mesh, deterministic=True)
    pp = stack_pipeline_params(params, fl.cfg.n_layers, 2)
    with mesh:
        ppd = jax.device_put(pp, pipeline_param_shardings(pp, mesh))
        rep = NamedSharding(mesh, P())
        micro = tuple(
            jax.device_put(np.asarray(a), rep) for a in fl.batch_args(stack)
        )
        se_d = jax.device_put(se_stack, rep)
        yd = jax.device_put(y, rep)
        rngd = jax.device_put(rng, rep)

        def pp_loss(p):
            return loss_fn(p["stages"], p["shared"], rngd, micro, se_d, yd)

        got = float(jax.jit(pp_loss)(ppd))
        g_pp = jax.jit(jax.grad(pp_loss))(ppd)

    assert got == pytest.approx(expected, rel=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_seq_pp),
        jax.tree_util.tree_leaves_with_path(jax.device_get(g_pp)),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_pp_train_step_runs_and_learns(pp_env):
    """A few pp train steps reduce the loss (training-mode path with
    dropout rngs plumbed per microbatch/stage/layer)."""
    from pyhgt_tpu.parallel.pipeline import (
        make_pipe_mesh,
        make_pp_train_step,
        pipeline_param_shardings,
        stack_pipeline_params,
    )

    fl, stack, se_stack, y, params = pp_env
    pp = stack_pipeline_params(params, fl.cfg.n_layers, 2)
    tx = make_optimizer(1e-2, weight_decay=0.0, clip_norm=0.25, params=pp)
    mesh = make_pipe_mesh(2)
    with mesh:
        ppd = jax.device_put(pp, pipeline_param_shardings(pp, mesh))
        state = TrainState.create(ppd, tx)
        step = make_pp_train_step(fl, tx, mesh, n_micro=3, donate=False)
        rep = NamedSharding(mesh, P())
        micro = tuple(
            jax.device_put(np.asarray(a), rep) for a in fl.batch_args(stack)
        )
        se_d = jax.device_put(se_stack, rep)
        yd = jax.device_put(y, rep)
        losses = []
        for i in range(8):
            state, loss = step(state, jax.random.key(i), micro, se_d, yd)
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_dp_pp_loss_and_grads_match_sequential():
    """dp×pp on a 2-D (data, pipe) mesh: each data shard pipelines its own
    M microbatches; loss and grads == the sequential mean over all Dp*M
    microbatches (stage params replicated along data, cotangents psum'd
    by shard_map)."""
    from pyhgt_tpu.parallel.pipeline import (
        make_pipe_mesh,
        make_pp_loss,
        pipeline_param_shardings,
        stack_pipeline_params,
    )
    from jax.sharding import PartitionSpec as P2

    fl = build_flagship("dryrun", dropout=0.0)
    n_total = 4  # Dp=2 shards x M=2 microbatches each
    batches, labels, ses = [], [], []
    for i in range(n_total):
        b, y = synth_flagship_batch(fl, seed=40 + i)
        batches.append(b)
        labels.append(y)
        ses.append(fl.sort(b))
    stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
    se_stack = jax.tree.map(lambda *xs: np.stack(xs), *ses)
    y = np.stack(labels)
    params = fl.init_params(jax.random.key(0), batches[0], ses[0])
    loss_single = fl.loss_fn_single()
    rng = jax.random.key(7)

    def seq_loss(p):
        losses = [
            loss_single(
                p, rng,
                *[jax.tree.map(lambda a: a[m], x) for x in fl.batch_args(stack)],
                jax.tree.map(lambda a: a[m], se_stack),
                y[m],
            )
            for m in range(n_total)
        ]
        return sum(losses) / n_total

    expected = float(seq_loss(params))
    g_seq_pp = stack_pipeline_params(
        jax.grad(seq_loss)(params), fl.cfg.n_layers, 2
    )

    mesh = make_pipe_mesh(2, n_data=2)
    assert mesh.axis_names == ("data", "pipe")
    loss_fn = make_pp_loss(fl, 2, 2, mesh, deterministic=True)  # M=2/shard
    pp = stack_pipeline_params(params, fl.cfg.n_layers, 2)
    with mesh:
        ppd = jax.device_put(pp, pipeline_param_shardings(pp, mesh))
        data_sh = NamedSharding(mesh, P2("data"))
        rep = NamedSharding(mesh, P2())
        micro = tuple(
            jax.device_put(np.asarray(a), data_sh)
            for a in fl.batch_args(stack)
        )
        se_d = jax.device_put(se_stack, data_sh)
        yd = jax.device_put(y, data_sh)
        rngd = jax.device_put(rng, rep)

        def pp_loss(p):
            return loss_fn(p["stages"], p["shared"], rngd, micro, se_d, yd)

        got = float(jax.jit(pp_loss)(ppd))
        g_pp = jax.jit(jax.grad(pp_loss))(ppd)

    assert got == pytest.approx(expected, rel=1e-5)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_seq_pp),
        jax.tree_util.tree_leaves_with_path(jax.device_get(g_pp)),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_param_sharding_rules(env):
    fl, *_ , params = env
    mesh = make_mesh(n_data=4, n_model=2, devices=jax.devices()[:8])
    shardings = param_shardings(params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    got = {}
    for path, s in flat:
        name = [p.key for p in path if hasattr(p, "key")][-1]
        got.setdefault(name, s.spec)
    assert got["wq"] == P(None, None, "model")
    assert got["rel_att"] == P(None, "model", None, None)
    assert got["wa"] == P(None, "model", None)
    assert got["skip"] == P()
    assert got["ln_scale"] == P()


def test_shard_map_dp_step(env):
    """shard_map dp loss == mean of per-shard unbatched losses."""
    from pyhgt_tpu.parallel.spmd import make_dp_train_step

    fl, stack, se_stack, y, params = env
    tx = make_optimizer(1e-2, weight_decay=0.0, clip_norm=0.25, params=params)
    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    loss_single = fl.loss_fn_single()
    rng = jax.random.key(5)

    # expected: mean over shards with fold_in rngs, computed serially
    expected = np.mean([
        float(loss_single(
            params, jax.random.fold_in(rng, i),
            *[jax.tree.map(lambda a: a[i], x) for x in fl.batch_args(stack)],
            jax.tree.map(lambda a: a[i], se_stack),
            y[i],
        ))
        for i in range(4)
    ])

    with mesh:
        from pyhgt_tpu.parallel.mesh import batch_sharding, replicate

        bs = batch_sharding(mesh)
        args = tuple(jax.device_put(a, bs) for a in fl.batch_args(stack))
        se_d = jax.device_put(se_stack, bs)
        yd = jax.device_put(y, bs)
        state = TrainState.create(jax.device_put(params, replicate(mesh)), tx)
        step = make_dp_train_step(loss_single, tx, mesh, donate=False)
        state2, loss = step(state, jax.device_put(rng, replicate(mesh)),
                            *args, se_d, yd)
    assert float(loss) == pytest.approx(expected, rel=1e-5)
    assert int(state2.step) == 1
