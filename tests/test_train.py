"""Train-layer tests: losses, schedules, loader, train step, checkpoint."""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyhgt_tpu.train import (
    PrefetchLoader,
    TrainState,
    cosine_schedule,
    dcg_at_k,
    make_optimizer,
    make_train_step,
    mean_reciprocal_rank,
    ndcg_at_k,
    onecycle_schedule,
)
from pyhgt_tpu.train.checkpoint import BestCheckpointPolicy, load_checkpoint, save_checkpoint
from pyhgt_tpu.train.metrics import ranking_metrics
from pyhgt_tpu.train.step import kl_div_loss, nll_loss


# ------------------------------------------------------------------ metrics
def test_ndcg_mrr_reference_semantics():
    # relevance list sorted by model score (pyHGT/utils.py:5-20 semantics)
    r = [0, 1, 0, 1]
    assert dcg_at_k(r, 4) == pytest.approx(1 / np.log2(3) + 1 / np.log2(5))
    ideal = dcg_at_k([1, 1, 0, 0], 4)
    assert ndcg_at_k(r, 4) == pytest.approx(dcg_at_k(r, 4) / ideal)
    assert mean_reciprocal_rank([r, [1, 0], [0, 0]]) == pytest.approx([0.5, 1.0, 0.0])


def test_ranking_metrics_batched():
    scores = np.array([[0.9, 0.1, 0.5], [0.1, 0.9, 0.5]])
    rel = np.array([[1, 0, 0], [1, 0, 0]])
    ndcg, mrr = ranking_metrics(scores, rel)
    # row 1: relevant item ranks 1st; row 2: it ranks 3rd (0.1 < 0.5 < 0.9)
    assert ndcg == pytest.approx((1.0 + 1 / np.log2(4)) / 2, abs=1e-6)
    assert mrr == pytest.approx((1.0 + 1 / 3) / 2, abs=1e-6)


# -------------------------------------------------------------------- losses
def test_nll_loss_matches_manual(rng):
    logp = np.log(np.clip(rng.dirichlet(np.ones(5), size=4), 1e-9, 1)).astype(np.float32)
    y = np.array([0, 2, 4, 1])
    expect = -np.mean([logp[i, y[i]] for i in range(4)])
    assert float(nll_loss(jnp.asarray(logp), jnp.asarray(y))) == pytest.approx(expect, rel=1e-5)


def test_kl_div_batchmean_semantics(rng):
    logp = np.log(np.clip(rng.dirichlet(np.ones(5), size=4), 1e-9, 1)).astype(np.float32)
    t = rng.dirichlet(np.ones(5), size=4).astype(np.float32)
    expect = np.mean(np.sum(t * (np.log(t) - logp), axis=1))
    assert float(kl_div_loss(jnp.asarray(logp), jnp.asarray(t))) == pytest.approx(
        expect, rel=1e-4
    )


# ----------------------------------------------------------------- schedules
def test_cosine_schedule_endpoints():
    s = cosine_schedule(1e-3, period=100, eta_min=1e-6)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(100)) == pytest.approx(1e-6, rel=1e-2)


def test_onecycle_matches_torch():
    """Step-for-step parity with the reference's exact scheduler call
    (``ogbn-mag/train_ogbn_mag.py:128-129``: OneCycleLR(pct_start=0.05,
    anneal_strategy='linear', final_div_factor=10, max_lr=5e-4))."""
    import torch

    total = 321  # n_batch*n_epoch + 1 style odd total
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref = torch.optim.lr_scheduler.OneCycleLR(
        opt, pct_start=0.05, anneal_strategy="linear",
        final_div_factor=10, max_lr=5e-4, total_steps=total,
    )
    torch_lrs = []
    for _ in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        opt.step()
        ref.step()

    s = onecycle_schedule(max_lr=5e-4, total_steps=total, pct_start=0.05)
    import jax

    ours = np.asarray(jax.vmap(s)(np.arange(total)))
    np.testing.assert_allclose(ours, np.array(torch_lrs), rtol=5e-5)

    # cos anneal shape (torch's own default strategy; cfg.onecycle_anneal)
    opt2 = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    ref2 = torch.optim.lr_scheduler.OneCycleLR(
        opt2, pct_start=0.3, anneal_strategy="cos",
        final_div_factor=1e4, max_lr=5e-4, total_steps=total,
    )
    torch_lrs2 = []
    for _ in range(total):
        torch_lrs2.append(opt2.param_groups[0]["lr"])
        opt2.step()
        ref2.step()
    s2 = onecycle_schedule(max_lr=5e-4, total_steps=total, pct_start=0.3,
                           final_div_factor=1e4, anneal="cos")
    ours2 = np.asarray(jax.vmap(s2)(np.arange(total)))
    # atol covers f32 cos round-off at the ~2e-9-scale tail (final_div 1e4)
    np.testing.assert_allclose(ours2, np.array(torch_lrs2), rtol=5e-5,
                               atol=1e-9)


# -------------------------------------------------------------------- loader
def test_cosine_torch_matches_torch_closed_form():
    """cosine_torch == torch CosineAnnealingLR driven exactly like the
    reference (scheduler.step(train_step), train_step starting at 1500,
    OAG/train_paper_field.py:205-212,256): oscillates past the period."""
    import warnings

    import torch

    from pyhgt_tpu.train.optim import cosine_torch_schedule

    lr0, period, eta_min, t0 = 5e-4, 1000, 1e-6, 1500
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=lr0)
    sched_t = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, period, eta_min=eta_min
    )
    ours = cosine_torch_schedule(lr0, period=period, eta_min=eta_min,
                                 start_step=t0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # torch deprecates .step(epoch)
        for step in [0, 1, 7, 250, 499, 500, 999, 1000, 1500, 2500, 4321]:
            sched_t.step(t0 + step)
            want = opt.param_groups[0]["lr"]
            got = float(ours(step))
            assert got == pytest.approx(want, rel=1e-6, abs=1e-12), step


def test_prefetch_loader_yields_and_repeats():
    def sample(rng):
        return {"x": np.full((2,), rng.integers(0, 1000))}

    with PrefetchLoader(sample, n_workers=2, repeat=2, seed=0) as loader:
        got = [np.asarray(b["x"])[0] for b in loader.take(8)]
    # every batch appears exactly `repeat` times consecutively
    for i in range(0, 8, 2):
        assert got[i] == got[i + 1]


def test_prefetch_loader_propagates_worker_error():
    def sample(rng):
        raise ValueError("boom")

    with PrefetchLoader(sample, n_workers=1, seed=0) as loader:
        with pytest.raises(ValueError, match="boom"):
            loader.take(1)


def test_prefetch_loader_raises_when_all_workers_dead():
    """A consumer that swallows the first error must not then block forever
    on an empty queue once every worker has exited (ADVICE round-1)."""
    def sample(rng):
        raise ValueError("boom")

    with PrefetchLoader(sample, n_workers=1, seed=0) as loader:
        with pytest.raises(ValueError, match="boom"):
            next(iter(loader))
        with pytest.raises(RuntimeError, match="workers have exited"):
            next(iter(loader))


@pytest.mark.parametrize("name", ["adamw", "adam", "sgd", "adagrad"])
def test_optimizer_choices(name):
    """Every reference --optimizer choice trains (train_paper_field.py:42-44,
    198-205)."""
    params = {"w": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}
    tx = make_optimizer(1e-2, params=params, name=name)
    state = TrainState.create(params, tx)

    def loss_fn(p, rng_key):
        return jnp.sum(p["w"] ** 2) + jnp.sum(p["bias"] ** 2)

    step = make_train_step(lambda p, r: loss_fn(p, r), tx)
    l0 = None
    for i in range(5):
        state, loss = step(state, jax.random.key(i))
        l0 = l0 if l0 is not None else float(loss)
    assert float(loss) < l0


def test_optimizer_unknown_raises():
    with pytest.raises(ValueError, match="unknown optimizer"):
        make_optimizer(1e-2, name="lamb")


def test_fused_adamw_matches_per_tensor_chain():
    """fused=True (single flattened-vector kernel chain) is the same math
    as chain(clip_by_global_norm, adamw(mask)) — step-for-step parity over
    a schedule, with the clip active on some steps and biases excluded
    from decay."""
    from pyhgt_tpu.train.optim import cosine_schedule

    rng = np.random.default_rng(0)
    params = {
        "layer": {
            "wq": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
            "bq": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
            "skip": jnp.asarray(rng.normal(size=(3,)), jnp.float32),
        },
        "head": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
    }
    sched = cosine_schedule(1e-2, 50)
    kw = dict(weight_decay=0.05, clip_norm=0.1, params=params)
    tx_ref = make_optimizer(sched, **kw)
    tx_fused = make_optimizer(sched, fused=True, **kw)

    def loss_fn(p, rng_key):
        return (
            jnp.sum(jnp.tanh(p["layer"]["wq"]) ** 2)
            + 50.0 * jnp.sum(p["layer"]["bq"] ** 2)  # big grads: clip fires
            + jnp.sum(p["layer"]["skip"] ** 2)
            + jnp.sum(p["head"] ** 2)
        )

    s_ref = TrainState.create(params, tx_ref)
    s_fused = TrainState.create(params, tx_fused)
    step_ref = make_train_step(loss_fn, tx_ref, donate=False)
    step_fused = make_train_step(loss_fn, tx_fused, donate=False)
    key = jax.random.key(0)
    for i in range(7):
        s_ref, l_ref = step_ref(s_ref, key)
        s_fused, l_fused = step_fused(s_fused, key)
        for a, b in zip(
            jax.tree.leaves(s_ref.params), jax.tree.leaves(s_fused.params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7
            )
    np.testing.assert_allclose(float(l_ref), float(l_fused), rtol=1e-5)


def test_fused_adamw_donated_step():
    """The fused state's mu/nu must be distinct buffers: the production
    train step donates the whole state, and aliased leaves fail with
    'donate the same buffer twice' (caught live on the CLI drive)."""
    params = {"w": jnp.ones((8, 8))}
    tx = make_optimizer(1e-2, params=params, fused=True)
    state = TrainState.create(params, tx)
    step = make_train_step(lambda p, r: jnp.sum(p["w"] ** 2), tx, donate=True)
    for i in range(2):
        state, loss = step(state, jax.random.key(i))
    assert np.isfinite(float(loss))


def test_param_bf16_masters_stay_f32():
    """param_bf16: weight banks cast to bf16 at apply time, f32 masters in
    the state; grads arrive f32, the loss stays within bf16 tolerance of
    the f32 path, and norm/bias/gate leaves are exempt from the cast."""
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import bf16_param_cast

    losses = {}
    for pb in (False, True):
        fl = build_flagship("tiny", param_bf16=pb)
        batch, labels = synth_flagship_batch(fl, seed=0)
        se = fl.sort(batch)
        params = fl.init_params(jax.random.key(0), batch, se)
        loss_fn = fl.loss_fn_single()
        args = tuple(np.asarray(a) for a in fl.batch_args(batch))
        l, g = jax.value_and_grad(loss_fn)(
            params, jax.random.key(1), *args, se, np.asarray(labels)
        )
        assert all(
            x.dtype == jnp.float32 and np.isfinite(np.asarray(x)).all()
            for x in jax.tree.leaves(g)
        )
        losses[pb] = float(l)
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)

    # the cast itself: banks -> bf16, no-decay leaves untouched
    p = {"layer": {"wq": jnp.ones((4, 4)), "bq": jnp.ones(4),
                   "ln_scale": jnp.ones(4)}}
    c = bf16_param_cast(p)
    assert c["layer"]["wq"].dtype == jnp.bfloat16
    assert c["layer"]["bq"].dtype == jnp.float32
    assert c["layer"]["ln_scale"].dtype == jnp.float32


def test_fused_adamw_rejects_non_f32():
    from pyhgt_tpu.train.optim import fused_adamw

    with pytest.raises(TypeError, match="all-f32"):
        fused_adamw(1e-2, {"w": jnp.ones((2,), jnp.bfloat16)})
    # make_optimizer falls back to the per-tensor chain instead
    tx = make_optimizer(
        1e-2, params={"w": jnp.ones((2,), jnp.bfloat16)}, fused=True
    )
    assert tx is not None


# ----------------------------------------------------------------- train step
def test_train_step_converges_linear_regression(rng):
    w_true = rng.normal(size=(8, 1)).astype(np.float32)
    X = rng.normal(size=(64, 8)).astype(np.float32)
    Y = X @ w_true

    def loss_fn(params, rng_key, x, y):
        pred = x @ params["w"]
        return jnp.mean((pred - y) ** 2)

    params = {"w": jnp.zeros((8, 1))}
    tx = make_optimizer(1e-1, weight_decay=0.0, clip_norm=None, params=params)
    state = TrainState.create(params, tx)
    step = make_train_step(loss_fn, tx)
    rng_key = jax.random.key(0)
    losses = []
    for _ in range(60):
        state, loss = step(state, rng_key, X, Y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 1e-2
    assert int(state.step) == 60


def test_train_step_acc_matches_mean_grad(rng):
    """Grad accumulation over A microbatches == one step on the averaged
    grads: same params after the step, mean loss returned, and A=1 is
    exactly make_train_step."""
    from pyhgt_tpu.train.step import make_train_step_acc

    w_true = rng.normal(size=(6, 1)).astype(np.float32)
    Xs = rng.normal(size=(2, 16, 6)).astype(np.float32)  # A=2 microbatches
    Ys = np.einsum("abc,cd->abd", Xs, w_true)

    def loss_fn(params, rng_key, x, y):
        return jnp.mean((x @ params["w"] - y) ** 2)

    params = {"w": jnp.asarray(rng.normal(size=(6, 1)).astype(np.float32))}
    tx = make_optimizer(1e-2, weight_decay=0.01, clip_norm=0.5, params=params)
    key = jax.random.key(3)

    # expected: average the two microbatch grads by hand, one tx.update
    import optax

    losses, grads = zip(*[
        jax.value_and_grad(loss_fn)(params, k, Xs[i], Ys[i])
        for i, k in enumerate(jax.random.split(key, 2))
    ])
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, *grads)
    st = TrainState.create(params, tx)
    upd, _ = tx.update(g_mean, st.opt_state, params)
    want = optax.apply_updates(params, upd)

    step_acc = make_train_step_acc(loss_fn, tx, donate=False)
    out, loss = step_acc(st, key, Xs, Ys)
    np.testing.assert_allclose(out.params["w"], want["w"], rtol=1e-6)
    np.testing.assert_allclose(
        float(loss), float((losses[0] + losses[1]) / 2), rtol=1e-6
    )
    assert int(out.step) == 1

    # A=1 degenerates to the plain step (up to the split-key rng)
    st2 = TrainState.create(params, tx)
    out1, loss1 = step_acc(st2, key, Xs[:1], Ys[:1])
    k1 = jax.random.split(key, 1)[0]
    st3 = TrainState.create(params, tx)
    out_ref, loss_ref = make_train_step(loss_fn, tx, donate=False)(
        st3, k1, Xs[0], Ys[0]
    )
    np.testing.assert_allclose(out1.params["w"], out_ref.params["w"], rtol=1e-6)
    np.testing.assert_allclose(float(loss1), float(loss_ref), rtol=1e-6)


def test_no_decay_mask_excludes_biases():
    from pyhgt_tpu.train.optim import _decay_mask

    params = {"layer": {"wq": np.ones((2, 2)), "bq": np.ones(2), "skip": np.ones(1)}}
    mask = _decay_mask(params)
    assert mask["layer"]["wq"] is True
    assert mask["layer"]["bq"] is False
    assert mask["layer"]["skip"] is False


# ---------------------------------------------------------------- checkpoint
def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    tx = make_optimizer(1e-2, params=params)
    state = TrainState.create(params, tx)
    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, state)
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = load_checkpoint(path, zero)
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), np.asarray(params["w"]))


def test_best_checkpoint_policy(tmp_path):
    path = os.path.join(tmp_path, "best")
    pol = BestCheckpointPolicy(path, mode="max")
    s1 = {"w": jnp.ones(2)}
    assert pol.update(0.5, s1)
    assert not pol.update(0.4, {"w": jnp.zeros(2)})
    assert pol.update(0.9, {"w": jnp.full((2,), 9.0)})
    restored = load_checkpoint(path, {"w": jnp.zeros(2)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), 9.0)


# ------------------------------------------------------------- observability
def test_metrics_logger(tmp_path):
    import json as _json

    from pyhgt_tpu.train.log import MetricsLogger, throughput

    p = str(tmp_path / "m.jsonl")
    with MetricsLogger(p) as m:
        m.log("step", loss=1.5, **throughput(1000, 4, 0.01))
        m.log("epoch", ndcg=0.4)
    lines = [_json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "step"
    assert lines[0]["edges_per_s"] == pytest.approx(400000.0)
    assert lines[1]["ndcg"] == 0.4


def test_debug_nans_toggle():
    import jax as _jax

    from pyhgt_tpu.train.log import debug_nans

    with debug_nans(True):
        assert _jax.config.jax_debug_nans
    assert not _jax.config.jax_debug_nans


def test_misc_utils(tmp_path, capsys):
    from pyhgt_tpu.utils.experiment import args_print, get_n_params, randint
    from pyhgt_tpu.utils.plot import plot_history

    args_print({"n_hid": 64, "lr": 1e-3})
    out = capsys.readouterr().out
    assert "n_hid" in out and "64" in out
    assert get_n_params({"a": np.ones((3, 4)), "b": np.ones(5)}) == 17
    s = randint()
    assert 0 <= s < 2**31
    p = plot_history(
        [{"epoch": 0, "loss": 1.0}, {"epoch": 1, "loss": 0.5}],
        str(tmp_path / "h.png"),
    )
    assert p is None or p.endswith(".png")


def test_profile_trace_writes_artifacts(tmp_path):
    import jax as _jax

    from pyhgt_tpu.train.log import profile_trace

    d = str(tmp_path / "trace")
    with profile_trace(d):
        _jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # the profiler writes a plugins/profile tree
    found = list(os.walk(d))
    assert any(files for _, _, files in found)


def test_onecycle_finite_at_tiny_total_steps():
    """Regression: optax floors phase boundaries to ints; with
    total_steps=8 and pct_start=0.05 the first phase spanned zero steps
    and the schedule returned NaN for EVERY learning rate (which NaN'd
    whole training runs). Boundaries must be whole steps >= 1 apart."""
    for ts in (2, 3, 8, 16):
        s = onecycle_schedule(max_lr=3e-3, total_steps=ts)
        vals = np.array([float(s(i)) for i in range(max(ts, 3))])
        assert np.isfinite(vals).all(), (ts, vals)
        # torch's fractional phase boundary means tiny cycles never touch
        # the exact peak; require a sane bracket instead
        assert vals.max() <= 3e-3 * (1 + 1e-6)
        assert vals.max() >= 3e-3 / 25 - 1e-9


def test_preset_schedulers_avoid_midcycle_quirk():
    """SURVEY §7 lists the reference's scheduler.step(train_step=1500)
    mid-cycle start as a quirk NOT to reproduce by default: it lives only
    behind the opt-in 'cosine_torch' (VERDICT r2 weak #6). No preset
    inherits it, and the default cosine starts at phase 0 (full lr)."""
    from pyhgt_tpu.config import PRESETS
    from pyhgt_tpu.train.optim import cosine_schedule

    for name, cfg in PRESETS.items():
        assert cfg.scheduler != "cosine_torch", name
    assert abs(float(cosine_schedule(1e-3, 1000)(0)) - 1e-3) < 1e-9
