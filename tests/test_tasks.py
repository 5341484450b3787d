"""Task-layer tests: pair building, leakage masks, losses, end-to-end train."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyhgt_tpu.graph.schema import PadSpec
from pyhgt_tpu.models import LinkMatcherModel, NodeClassifierModel
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.sampling.hgsampler import HGSampler
from pyhgt_tpu.tasks import (
    LinkPredictionTask,
    NodeClassificationTask,
    OgbnNodeTask,
    TimeSplit,
    build_time_split_pairs,
)
from pyhgt_tpu.tasks.link_prediction import (
    build_link_pairs,
    build_name_groups,
    make_link_loss_fn,
)
from pyhgt_tpu.train.optim import make_optimizer
from pyhgt_tpu.train.step import TrainState, make_train_step


SPLITS = {
    "train": TimeSplit(hi=2014),
    "valid": TimeSplit(lo=2015, hi=2016),
    "test": TimeSplit(lo=2017),
}


@pytest.fixture(scope="module")
def task_env():
    from tests.conftest import make_toy_graph

    csr = make_toy_graph(n_paper=60, n_author=30, n_venue=5, seed=1).freeze()
    sampler = HGSampler(csr, depth=2, width=8)
    pad = PadSpec(node_cap=64, default_edge_cap=128)
    layout = BatchLayout(schema=csr.schema, pad=pad)
    em = EdgeStaticMeta.from_layout(layout)
    return csr, sampler, layout, em


def _gnn_kwargs(layout, n_hid=16):
    return dict(
        in_dim=16, n_hid=n_hid, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
        dropout=0.1, prev_norm=True, last_norm=True,
    )


def test_build_time_split_pairs(task_env):
    csr, *_ = task_env
    # paper-indexed reverse relation: each paper's venues
    pairs_p = build_time_split_pairs(csr, ("paper", "venue", "rev_PV_in"), SPLITS)
    assert sum(len(p) for p in pairs_p.values()) > 0
    # every pair's stored time falls in its split window
    for name, split in SPLITS.items():
        for tgt, (labels, t) in pairs_p[name].items():
            assert split.contains(np.array([t]))[0]
            assert len(labels) >= 1


def test_node_classification_sample_and_mask(task_env):
    csr, sampler, layout, em = task_env
    task = NodeClassificationTask(
        graph=csr, sampler=sampler, layout=layout,
        target_type="paper", label_meta=("venue", "paper", "PV_in"),
        batch_size=8, multi_label=True,
    )
    pairs = build_time_split_pairs(csr, ("paper", "venue", "rev_PV_in"), SPLITS)
    tb = task.sample(pairs["train"], SPLITS["train"], np.random.default_rng(0))
    assert tb.labels.shape == (8, task.n_classes)
    live = tb.labels[tb.label_mask]
    np.testing.assert_allclose(live.sum(axis=1), 1.0, rtol=1e-5)

    # leakage check: no PV edges between seed papers and venues remain
    C = layout.node_cap
    p_ti = layout.schema.type_id("paper")
    v_ti = layout.schema.type_id("venue")
    for b in layout.blocks:
        meta = b.meta.as_tuple()
        sl = slice(b.start, b.stop)
        emask = np.asarray(tb.sub.edge_mask[sl])
        if meta == ("venue", "paper", "PV_in"):
            src_local = np.asarray(tb.sub.edge_src[sl]) - p_ti * C
            assert not np.any(emask & (src_local < 8))
        if meta == ("paper", "venue", "rev_PV_in"):
            tgt_local = np.asarray(tb.sub.edge_tgt[sl]) - p_ti * C
            assert not np.any(emask & (tgt_local < 8))


def test_node_classification_trains(task_env):
    csr, sampler, layout, em = task_env
    task = NodeClassificationTask(
        graph=csr, sampler=sampler, layout=layout,
        target_type="paper", label_meta=("venue", "paper", "PV_in"),
        batch_size=8, multi_label=True,
    )
    pairs = build_time_split_pairs(csr, ("paper", "venue", "rev_PV_in"), SPLITS)
    model = NodeClassifierModel(
        gnn_kwargs=_gnn_kwargs(layout), n_classes=task.n_classes,
        target_type_id=layout.schema.type_id("paper"),
        head_mode="seeds", n_seed=8,
    )
    rng = np.random.default_rng(0)
    tb = task.sample(pairs["train"], SPLITS["train"], rng)
    params = model.init(jax.random.key(0), *tb.batch_args, em)
    tx = make_optimizer(1e-2, weight_decay=0.0, clip_norm=0.25, params=params)
    state = TrainState.create(params, tx)
    loss_fn = task.make_loss_fn(model, em)
    step = make_train_step(loss_fn, tx)
    losses = []
    for i in range(12):
        tb = task.sample(pairs["train"], SPLITS["train"], rng)
        state, loss = step(
            state, jax.random.key(i), *tb.batch_args, tb.labels, tb.label_mask
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_ogbn_task(task_env):
    csr, sampler, layout, em = task_env
    n_paper = csr.num_nodes["paper"]
    rng = np.random.default_rng(0)
    csr.aux.update(
        y=rng.integers(0, 5, size=n_paper),
        years=np.full(n_paper, 2015),
        train_mask=rng.random(n_paper) < 0.6,
        valid_mask=np.zeros(n_paper, bool),
        test_mask=np.zeros(n_paper, bool),
    )
    csr.aux["valid_mask"][:5] = True
    task = OgbnNodeTask(
        graph=csr, sampler=sampler, layout=layout, batch_size=8,
    )
    tb = task.sample(np.arange(8), rng, split="train")
    C = layout.node_cap
    assert tb.labels.shape == (C,)
    assert tb.label_mask.shape == (C,)
    assert tb.label_mask.sum() > 0

    model = NodeClassifierModel(
        gnn_kwargs=_gnn_kwargs(layout), n_classes=task.n_classes,
        target_type_id=layout.schema.type_id("paper"), head_mode="full",
    )
    params = model.init(jax.random.key(0), *tb.batch_args, em)
    loss_fn = task.make_loss_fn(model, em)
    loss = loss_fn(
        params, jax.random.key(1), *tb.batch_args, tb.labels, tb.label_mask
    )
    assert np.isfinite(float(loss))
    # accuracy helper
    logp = np.log(np.full((4, 5), 0.2))
    acc = OgbnNodeTask.accuracy(logp, np.zeros(4, int), np.ones(4, bool))
    assert 0.0 <= acc <= 1.0


def test_multi_sample_eval(task_env):
    from pyhgt_tpu.tasks import multi_sample_eval

    csr, sampler, layout, em = task_env
    n_paper = csr.num_nodes["paper"]
    rng = np.random.default_rng(0)
    csr.aux.update(
        y=rng.integers(0, 5, size=n_paper),
        years=np.full(n_paper, 2015),
        train_mask=np.zeros(n_paper, bool),
        valid_mask=np.zeros(n_paper, bool),
        test_mask=rng.random(n_paper) < 0.4,
    )
    task = OgbnNodeTask(graph=csr, sampler=sampler, layout=layout, batch_size=8)
    model = NodeClassifierModel(
        gnn_kwargs=_gnn_kwargs(layout), n_classes=task.n_classes,
        target_type_id=layout.schema.type_id("paper"), head_mode="full",
    )
    tb = task.sample(np.arange(4), rng, split="test")
    params = model.init(jax.random.key(0), *tb.batch_args, em)
    fwd = jax.jit(lambda p, *a: model.apply(p, *a, em))
    out = multi_sample_eval(
        fwd, params, task, split="test", batch_size=8, vr_num=2,
        rng=rng, max_nodes=16,
    )
    assert 0.0 <= out["acc"] <= 1.0
    assert out["n_eval"] > 0
    assert 0.0 <= out["seq_acc"] <= 1.0
    assert len(out["vr_curve"]) == 2 and out["vr_curve"][-1] == out["acc"]
    # layout contract: seed rows carry the requested papers verbatim
    assert out["seed_id_match_frac"] == 1.0


def test_multi_sample_eval_accounting():
    """Pin the evaluator's exact accounting with a crafted task.

    Protocol parity targets (``eval_ogbn_mag.py``): ``acc`` = per-node
    argmax of vr_num accumulated log-prob rows (``:149-150,182-191``);
    ``seq_acc`` = the same with resample 0 only (``:163-179``); the
    occurrence metrics split seed vs periphery rows.
    """
    from pyhgt_tpu.tasks import multi_sample_eval

    C, n_classes = 4, 3
    n_nodes = 6

    class FakeBatch:
        def __init__(self, ids, labels, live, logp):
            self.target_ids = np.asarray(ids, np.int64)
            self.labels = np.asarray(labels, np.int32)
            self.label_mask = np.asarray(live, bool)
            self._logp = np.asarray(logp, np.float64)

        @property
        def batch_args(self):
            return (self._logp,)

    class FakeTask:
        n_classes = 3
        y = np.array([0, 1, 2, 0, 1, 2])
        masks = {"test": np.array([True, True, False, False, False, True])}

        def __init__(self):
            self.calls = 0
            # two resamples of the single batch seeded at nodes [0, 1]:
            #   k=0: seeds 0,1 live; periphery node 5 live with a WRONG,
            #        very confident row.
            #   k=1: seeds only; node 0's row flips to confidently wrong,
            #        strongly enough to beat k=0's correct row.
            self.batches = [
                FakeBatch(
                    ids=[0, 1, 5, -1],
                    labels=[0, 1, 2, 0],
                    live=[True, True, True, False],
                    logp=[[-0.1, -3, -3], [-3, -0.1, -3],
                          [-9, -0.1, -9], [0, 0, 0]],
                ),
                FakeBatch(
                    ids=[0, 1, -1, -1],
                    labels=[0, 1, 0, 0],
                    live=[True, True, False, False],
                    logp=[[-9, -0.05, -9], [-3, -0.1, -3],
                          [0, 0, 0], [0, 0, 0]],
                ),
            ]

        def sample(self, papers, rng, split="test"):
            b = self.batches[self.calls]
            self.calls += 1
            return b

    task = FakeTask()
    out = multi_sample_eval(
        lambda p, logp: logp, None, task, split="test",
        batch_size=2, vr_num=2, shuffle=False, max_nodes=2,
    )
    # VR accumulation: node0 = k0 + k1 rows → argmax 1 (wrong);
    # node1 correct both; node5 wrong (periphery only) → acc = 1/3
    assert out["acc"] == pytest.approx(1 / 3)
    assert out["n_eval"] == 3
    # sequential = resample 0 only: node0 ✓, node1 ✓, node5 ✗ → 2/3
    assert out["seq_acc"] == pytest.approx(2 / 3)
    assert out["n_eval_seq"] == 3
    assert out["vr_curve"] == pytest.approx([2 / 3, 1 / 3])
    # occurrences: 4 seed rows (3 hits: n0k0, n1k0, n1k1), 1 periphery miss
    assert out["seed_occ_acc"] == pytest.approx(3 / 4)
    assert out["peri_occ_acc"] == 0.0
    assert out["seed_occ_total"] == 4 and out["peri_occ_total"] == 1
    # seed-only protocols exclude node5: VR = node0 ✗ node1 ✓ = 1/2;
    # seq = both ✓
    assert out["seed_vr_acc"] == pytest.approx(1 / 2)
    assert out["seed_seq_acc"] == pytest.approx(1.0)
    # node0's two predictions disagree (0 then 1), node1 agrees
    assert out["seed_agreement"] == pytest.approx((1 / 2 + 1) / 2)
    # live-id sets differ between resamples → no dup
    assert out["resample_dup_frac"] == 0.0


def test_link_prediction_task(task_env):
    csr, sampler, layout, em = task_env
    groups = build_name_groups(
        csr, ("author", "paper", "rev_AP_write"), min_papers=1, min_group=3
    )
    assert len(groups) > 0
    pairs = build_link_pairs(
        csr, groups, SPLITS, ("author", "paper", "rev_AP_write")
    )
    task = LinkPredictionTask(
        graph=csr, sampler=sampler, layout=layout, groups=groups,
        write_meta=("paper", "author", "AP_write"),
        batch_size=8, max_group=8,
    )
    rng = np.random.default_rng(0)
    tb = task.sample(pairs["train"], SPLITS["train"], rng)
    assert tb.cand_idx.shape == (8, 8)
    assert tb.query_mask.sum() > 0

    model = LinkMatcherModel(
        gnn_kwargs=_gnn_kwargs(layout), n_hid=16,
        query_type_id=layout.schema.type_id("paper"), n_query=8,
    )
    params = model.init(
        jax.random.key(0), *tb.batch_args, em, tb.cand_idx,
        method=LinkMatcherModel.score_pairs,
    )
    loss_fn = make_link_loss_fn(model, em)
    loss = loss_fn(
        params, jax.random.key(1), *tb.batch_args,
        tb.cand_idx, tb.cand_mask, tb.query_mask,
    )
    assert np.isfinite(float(loss))


def test_matcher_index(rng):
    from pyhgt_tpu.models import Matcher
    from pyhgt_tpu.tasks.matcher_index import MatcherIndex

    m = Matcher(n_hid=8)
    cands = rng.normal(size=(50, 8)).astype(np.float32)
    queries = rng.normal(size=(4, 8)).astype(np.float32)
    params = m.init(jax.random.key(0), cands[:1], queries[:1])

    idx = MatcherIndex(
        matcher_apply=lambda p, x: m.apply(p, x, method=Matcher.left)
    ).build(params, cands, batch=16)
    q_emb = m.apply(params, queries, method=Matcher.right)
    scores = np.asarray(idx.score(q_emb))
    # parity with the direct two-tower path
    direct = np.asarray(m.apply(params, cands, queries, pair=False)).T
    np.testing.assert_allclose(scores, direct, rtol=1e-5, atol=1e-5)
    vals, ids = idx.score(q_emb, top_k=3)
    assert np.asarray(vals).shape == (4, 3)
    best = np.argmax(scores, axis=1)
    np.testing.assert_array_equal(np.asarray(ids)[:, 0], best)
    v0 = idx.params_version
    idx.refresh(params, cands)
    assert idx.params_version == v0 + 1


def test_distributed_initialize_single_host():
    from pyhgt_tpu.parallel.distributed import initialize

    info = initialize()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


_DIST_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])
from pyhgt_tpu.parallel.distributed import initialize
info = initialize(coordinator_address=f"localhost:{port}",
                  num_processes=n, process_id=pid)
assert info["process_count"] == n, info
assert info["global_devices"] == n, info
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
mesh = Mesh(np.asarray(jax.devices()), ("data",))
f = shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
              in_specs=P("data"), out_specs=P(), check_vma=False)
arr = jax.make_array_from_single_device_arrays(
    (n, 4), NamedSharding(mesh, P("data")),
    [jax.device_put(np.full((1, 4), float(pid + 1), np.float32),
                    jax.local_devices()[0])])
got = float(np.asarray(jax.device_get(f(arr)))[0, 0])
assert got == sum(range(1, n + 1)), got
print("ok", pid)
"""


def test_distributed_two_process_psum(tmp_path):
    """Real multi-process bootstrap: 2 CPU processes form a jax.distributed
    cluster (Gloo) and a cross-process psum returns the global sum on both
    — the multi-host story the reference lacks (SURVEY §2.9), integration-
    tested without a TPU slice (SURVEY §4 test plan item 4)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:       # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "worker.py"
    worker.write_text(_DIST_WORKER)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", str(port), root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "ok" in out, out


def test_link_model_with_matcher_index(task_env):
    """Serving flow: GNN representations -> candidate index -> top-k
    (the reference's million-candidate ranking, done with explicit
    invalidation)."""
    from pyhgt_tpu.models import LinkMatcherModel, Matcher
    from pyhgt_tpu.sampling.sorted_batch import sort_batch
    from pyhgt_tpu.tasks.link_prediction import build_link_pairs, build_name_groups
    from pyhgt_tpu.tasks import LinkPredictionTask, TimeSplit
    from pyhgt_tpu.tasks.matcher_index import MatcherIndex

    csr, sampler, layout, em = task_env
    groups = build_name_groups(
        csr, ("author", "paper", "rev_AP_write"), min_papers=1, min_group=3
    )
    pairs = build_link_pairs(csr, groups, SPLITS, ("author", "paper", "rev_AP_write"))
    task = LinkPredictionTask(
        graph=csr, sampler=sampler, layout=layout, groups=groups,
        write_meta=("paper", "author", "AP_write"), batch_size=8, max_group=8,
    )
    rng = np.random.default_rng(0)
    tb = task.sample(pairs["train"], SPLITS["train"], rng)
    se = sort_batch(tb.sub, layout, em)
    model = LinkMatcherModel(
        gnn_kwargs=_gnn_kwargs(layout), n_hid=16,
        query_type_id=layout.schema.type_id("paper"), n_query=8,
    )
    params = model.init(
        jax.random.key(0), *tb.batch_args, em, tb.cand_idx, se=se,
        method=LinkMatcherModel.score_pairs,
    )
    # author representations from the GNN
    h = model.apply(
        params, *tb.batch_args, em, se=se,
        method=lambda m, *a, **k: m.gnn(*a, **k),
    )
    a_ti = layout.schema.type_id("author")
    authors = np.asarray(h[a_ti])
    queries = np.asarray(h[layout.schema.type_id("paper")][:8])

    idx = MatcherIndex(
        matcher_apply=lambda p, x: model.apply(
            p, x, method=lambda m, xx: m.matcher.left(xx)
        )
    ).build(params, authors, batch=16)
    q_emb = model.apply(
        params, queries, method=lambda m, xx: m.matcher.right(xx)
    )
    vals, ids = idx.score(q_emb, top_k=3)
    assert np.asarray(vals).shape == (8, 3)
    assert np.asarray(ids).max() < authors.shape[0]


def test_vr_gains_on_seed_paired_protocol():
    """Regression pin for the round-5 VR root-cause
    (docs/runs/vr_inversion_memo.md): on the SEED-PAIRED protocol — the
    one the reference's published +0.67 VR uplift uses
    (eval_ogbn_mag.py:128-191) — accumulating vr_num independent noisy
    predictions per node must beat the single-resample baseline. Models
    the resample process directly: each resample's forward emits
    log-probs for the true class corrupted by iid noise strong enough
    for ~30% single-shot errors; averaging 8 must recover most of them.
    """
    from pyhgt_tpu.tasks import multi_sample_eval

    n_nodes, C = 512, 5
    master = np.random.default_rng(123)
    y = master.integers(0, C, size=n_nodes)

    class NoisyBatch:
        def __init__(self, ids, labels, logp):
            self.target_ids = ids
            self.labels = labels
            self.label_mask = np.ones(len(ids), bool)
            self._logp = logp

        @property
        def batch_args(self):
            return (self._logp,)

    class NoisyTask:
        n_classes = C

        def __init__(self):
            self.y = y
            self.masks = {"test": np.ones(n_nodes, bool)}
            self.noise_rng = np.random.default_rng(7)

        def sample(self, papers, rng, split="test"):
            logp = np.full((len(papers), C), -3.0)
            logp[np.arange(len(papers)), y[papers]] = -0.5
            logp += self.noise_rng.normal(0, 1.6, size=logp.shape)
            return NoisyBatch(papers, y[papers].astype(np.int32), logp)

    out = multi_sample_eval(
        lambda p, logp: logp, None, NoisyTask(), split="test",
        batch_size=128, vr_num=8, rng=np.random.default_rng(0),
        shuffle=False,
    )
    # single-shot lands mid-pack; 8-sample accumulation must clearly win
    assert 0.5 < out["seed_seq_acc"] < 0.95
    assert out["seed_vr_acc"] > out["seed_seq_acc"] + 0.03
    # no periphery in this model, so the unrestricted pair agrees
    assert out["acc"] > out["seq_acc"] + 0.03
    assert out["acc"] == out["seed_vr_acc"]
    # and the curve is (noisily) improving, not degrading
    assert out["vr_curve"][-1] > out["vr_curve"][0]
