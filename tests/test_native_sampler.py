"""Native C++ sampler: build, determinism, and parity with the Python
sampler (distributional — the RNGs differ by design)."""

import numpy as np
import pytest

from pyhgt_tpu.sampling.hgsampler import HGSampler


@pytest.fixture(scope="module")
def native_env():
    from tests.conftest import make_toy_graph
    from pyhgt_tpu.sampling.native import NativeHGSampler

    csr = make_toy_graph(n_paper=80, n_author=40, n_venue=6, seed=3).freeze()
    return csr, NativeHGSampler(csr, depth=3, width=16)


def _seeds(csr, n=6, time=2019):
    ids = np.arange(n)
    return {"paper": np.stack([ids, np.full(n, time)], axis=1)}


def test_native_builds_and_samples(native_env):
    csr, ns = native_env
    raw = ns.sample_raw(_seeds(csr), seed=7)
    assert len(raw.node_ids["paper"]) >= 6
    # seeds come first, in order
    np.testing.assert_array_equal(raw.node_ids["paper"][:6], np.arange(6))
    # all edges index into sampled ranges
    for (tt, st, _), (tgt, src) in raw.edges.items():
        assert tgt.max() < len(raw.node_ids[tt])
        assert src.max() < len(raw.node_ids[st])
        assert tgt.min() >= 0 and src.min() >= 0


def test_native_deterministic_per_seed(native_env):
    csr, ns = native_env
    a = ns.sample_raw(_seeds(csr), seed=123)
    b = ns.sample_raw(_seeds(csr), seed=123)
    c = ns.sample_raw(_seeds(csr), seed=124)
    for t in a.node_ids:
        np.testing.assert_array_equal(a.node_ids[t], b.node_ids[t])
    assert any(
        len(a.node_ids[t]) != len(c.node_ids[t])
        or not np.array_equal(a.node_ids[t], c.node_ids[t])
        for t in a.node_ids
    )


def test_native_temporal_filter(native_env):
    csr, ns = native_env
    raw = ns.sample_raw(_seeds(csr), seed=5, time_max=2005)
    for t, times in raw.node_time.items():
        n_seed = raw.seed_counts.get(t, 0)
        if len(times) > n_seed:
            assert times[n_seed:].max() <= 2005


def test_native_vs_python_coverage(native_env):
    """Both samplers should reach a similar node population from the same
    seeds (distributional parity; exact draws differ)."""
    csr, ns = native_env
    py = HGSampler(csr, depth=3, width=16)
    seeds = _seeds(csr)
    n_native = []
    n_py = []
    for s in range(5):
        rn = ns.sample_raw(seeds, seed=s)
        rp = py.sample_raw(seeds, rng=np.random.default_rng(s))
        n_native.append(sum(len(v) for v in rn.node_ids.values()))
        n_py.append(sum(len(v) for v in rp.node_ids.values()))
    assert abs(np.mean(n_native) - np.mean(n_py)) < 0.25 * np.mean(n_py)


def test_native_edges_match_graph(native_env):
    """Every reconstructed edge exists in the CSR graph."""
    csr, ns = native_env
    raw = ns.sample_raw(_seeds(csr), seed=11)
    for meta, (tgt, src) in raw.edges.items():
        adj = csr.adj[meta]
        tids = raw.node_ids[meta[0]]
        sids = raw.node_ids[meta[1]]
        for tl, sl in zip(tgt[:50], src[:50]):
            row, _ = adj.row(int(tids[tl]))
            assert int(sids[sl]) in row.tolist()


def test_native_sampler_in_engine(tmp_path):
    """The engine's native_sampler=True path end-to-end (C++ sampler
    feeding the prefetch loader and the jit step)."""
    import numpy as np

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.experiments import run_node_classification
    from tests.conftest import make_toy_graph

    csr = make_toy_graph(n_paper=60, n_author=30, n_venue=5, seed=4).freeze()
    cfg = ExperimentConfig(
        task_name="native_toy", model_dir=str(tmp_path),
        n_hid=16, n_heads=4, n_layers=2, sample_depth=2, sample_width=8,
        batch_size=8, n_batch=2, repeat=1, n_pool=2, n_epoch=1,
        node_cap=64, edge_cap=128, native_sampler=True, max_lr=1e-2,
    )
    out = run_node_classification(
        cfg, csr, label_meta=("venue", "paper", "PV_in"), multi_label=True,
        log=lambda s: None,
    )
    assert 0.0 <= out["test_ndcg"] <= 1.0
