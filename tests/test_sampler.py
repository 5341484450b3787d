"""HGSampling tests (parity targets: pyHGT/data.py:87-210).

Statistical + structural checks modeled on SURVEY.md §4 item 3:
type balance, score ∝ degree², temporal filter, leakage mask, determinism.
"""

import numpy as np
import pytest

from pyhgt_tpu.graph import Graph, GraphSchema
from pyhgt_tpu.graph.schema import PadSpec
from pyhgt_tpu.sampling import BatchLayout, HGSampler, mask_seed_edges, pad_sample

from conftest import make_toy_graph


def seeds_for(csr, n=4, t="paper", time=2019, seed=1):
    r = np.random.default_rng(seed)
    ids = r.choice(csr.num_nodes[t], size=n, replace=False)
    return {t: np.stack([ids, np.full(n, time)], axis=1)}


def test_seeds_come_first_and_dedup(toy_csr):
    s = HGSampler(toy_csr, depth=2, width=8).sample_raw(
        seeds_for(toy_csr, n=4), rng=np.random.default_rng(0)
    )
    seeds = seeds_for(toy_csr, n=4)["paper"]
    assert s.node_ids["paper"][:4].tolist() == seeds[:, 0].tolist()
    # no duplicate nodes within a type
    for t, ids in s.node_ids.items():
        assert len(set(ids.tolist())) == len(ids)


def test_type_balance_bound(toy_csr):
    depth, width, n_seed = 3, 6, 4
    s = HGSampler(toy_csr, depth=depth, width=width).sample_raw(
        seeds_for(toy_csr, n=n_seed), rng=np.random.default_rng(0)
    )
    for t, ids in s.node_ids.items():
        bound = depth * width + (n_seed if t == "paper" else 0)
        assert len(ids) <= bound


def test_induced_edges_exist_in_graph(toy_csr):
    s = HGSampler(toy_csr, depth=2, width=8).sample_raw(
        seeds_for(toy_csr), rng=np.random.default_rng(0)
    )
    assert s.edges, "expected at least one meta-relation sampled"
    for meta, (tgt_l, src_l) in s.edges.items():
        adj = toy_csr.adj[meta]
        tt, st, _ = meta
        for tl, sl in zip(tgt_l.tolist(), src_l.tolist()):
            tid = int(s.node_ids[tt][tl])
            sid = int(s.node_ids[st][sl])
            srcs, _ = adj.row(tid)
            assert sid in srcs.tolist()


def test_temporal_filter():
    g = make_toy_graph(seed=3)
    csr = g.freeze()
    time_max = 2010
    sampler = HGSampler(csr, depth=3, width=16, time_max=time_max)
    # seed with an old paper so expansion has room under the bar
    s = sampler.sample_raw(
        {"paper": np.array([[0, 2005]])}, rng=np.random.default_rng(0)
    )
    for t, times in s.node_time.items():
        non_seed = times[1:] if t == "paper" else times
        assert (non_seed <= time_max).all()


def test_no_temporal_filter_mode(toy_csr):
    # ogbn-mag copy semantics: no time_range arg (ogbn-mag/pyHGT/data.py:87)
    s = HGSampler(toy_csr, depth=2, width=8, time_max=None).sample_raw(
        seeds_for(toy_csr, time=2000), rng=np.random.default_rng(0)
    )
    assert sum(len(v) for v in s.node_ids.values()) > 4


def test_degree_squared_bias():
    """A hub neighbor (high budget score) must be drawn far more often."""
    g = Graph()
    hub = {"id": "hub", "type": "author"}
    seeds = [{"id": f"p{i}", "type": "paper"} for i in range(12)]
    # hub co-occurs with every seed; 30 leaf authors touch one seed each
    for i, p in enumerate(seeds):
        g.add_edge(hub, p, time=2000, relation_type="AP_write")
        for j in range(3):
            leaf = {"id": f"leaf{i}_{j}", "type": "author"}
            g.add_edge(leaf, p, time=2000, relation_type="AP_write")
    g.set_features("paper", {"emb": np.zeros((len(seeds), 4), np.float32)})
    g.set_features("author", {"emb": np.zeros((g.num_nodes('author'), 4), np.float32)})
    csr = g.freeze()
    sampler = HGSampler(csr, depth=1, width=4, time_max=2020)
    seed_inp = {
        "paper": np.stack(
            [np.arange(len(seeds)), np.full(len(seeds), 2000)], axis=1
        )
    }
    hub_id = 0  # first author interned
    hits = 0
    trials = 200
    r = np.random.default_rng(7)
    for _ in range(trials):
        s = sampler.sample_raw(seed_inp, rng=r)
        sampled_authors = set(s.node_ids["author"].tolist())
        if hub_id in sampled_authors:
            hits += 1
    # hub budget score = 12/4 = 3, each leaf 1/4; score² → 9 vs 36 * 1/16,
    # so a 4-node draw contains the hub almost surely
    assert hits / trials > 0.9


def test_determinism_under_seed(toy_csr):
    sampler = HGSampler(toy_csr, depth=3, width=8)
    a = sampler.sample_raw(seeds_for(toy_csr), rng=np.random.default_rng(42))
    b = sampler.sample_raw(seeds_for(toy_csr), rng=np.random.default_rng(42))
    for t in a.node_ids:
        assert a.node_ids[t].tolist() == b.node_ids[t].tolist()
    assert set(a.edges) == set(b.edges)
    for m in a.edges:
        assert a.edges[m][0].tolist() == b.edges[m][0].tolist()


def test_leakage_mask(toy_csr):
    s = HGSampler(toy_csr, depth=2, width=8).sample_raw(
        seeds_for(toy_csr, n=4), rng=np.random.default_rng(0)
    )
    meta_fwd = ("paper", "venue", "rev_PV_in")
    meta_rev = ("venue", "paper", "PV_in")
    mask_seed_edges(s, meta_fwd, num_seeds=4, seed_side="tgt")
    mask_seed_edges(s, meta_rev, num_seeds=4, seed_side="src")
    if meta_fwd in s.edges:
        assert (s.edges[meta_fwd][0] >= 4).all()
    if meta_rev in s.edges:
        assert (s.edges[meta_rev][1] >= 4).all()


def test_pad_sample_layout(toy_csr):
    sampler = HGSampler(toy_csr, depth=2, width=8)
    s = sampler.sample_raw(seeds_for(toy_csr, n=4), rng=np.random.default_rng(0))
    pad = PadSpec.for_sampler(4, 2, 8, toy_csr.schema, align=8)
    layout = BatchLayout(toy_csr.schema, pad)
    feats = {
        t: toy_csr.features[t]["emb"][ids] for t, ids in s.node_ids.items()
    }
    b = pad_sample(s, layout, feats)
    T, C = layout.num_types, layout.node_cap
    assert b.node_feat.shape == (T, C, 16)
    assert b.edge_src.shape == (layout.num_edges,)
    # masked-node invariants
    assert b.node_mask.sum() == sum(len(v) for v in s.node_ids.values())
    # every real edge points at real nodes
    et, es = b.edge_tgt[b.edge_mask], b.edge_src[b.edge_mask]
    flat_mask = b.node_mask.reshape(-1)
    assert flat_mask[et].all() and flat_mask[es].all()
    # self block contains exactly one loop per real node
    self_blocks = [blk for blk in layout.blocks if blk.meta.rel == "self"]
    n_self = sum(
        int(b.edge_mask[blk.start : blk.stop].sum()) for blk in self_blocks
    )
    assert n_self == int(b.node_mask.sum())
    # dt within RTE table range
    assert (b.edge_dt >= 0).all() and (b.edge_dt < 240).all()
    # features landed in the right rows
    pid = toy_csr.schema.type_id("paper")
    np.testing.assert_allclose(
        b.node_feat[pid, : len(s.node_ids["paper"])], feats["paper"]
    )


def test_pad_calibration(toy_csr):
    sampler = HGSampler(toy_csr, depth=2, width=8)
    pad = PadSpec.calibrate(
        sampler, lambda: seeds_for(toy_csr, n=4), n_trials=2, align=8
    )
    layout = BatchLayout(toy_csr.schema, pad)
    s = sampler.sample_raw(seeds_for(toy_csr, n=4), rng=np.random.default_rng(5))
    feats = {t: toy_csr.features[t]["emb"][ids] for t, ids in s.node_ids.items()}
    b = pad_sample(s, layout, feats)
    assert b.node_mask.any()


def test_pad_sample_edge_overflow_subsamples(toy_csr):
    """Edges beyond a block's cap are uniformly subsampled and the drop
    count is recorded in block_overflow."""
    import numpy as np

    from pyhgt_tpu.graph.schema import PadSpec
    from pyhgt_tpu.sampling.batch import BatchLayout, pad_sample
    from pyhgt_tpu.sampling.hgsampler import HGSampler

    s = HGSampler(toy_csr, depth=2, width=8)
    rng = np.random.default_rng(0)
    years = np.full(6, 2019)
    raw = s.sample_raw({"paper": np.stack([np.arange(6), years], 1)}, rng=rng)
    # tiny edge caps force overflow
    layout = BatchLayout(
        schema=toy_csr.schema, pad=PadSpec(node_cap=32, default_edge_cap=2)
    )
    feats = {
        t: np.asarray(toy_csr.features[t]["emb"])[ids]
        for t, ids in raw.node_ids.items() if len(ids)
    }
    batch = pad_sample(raw, layout, feats, rng=rng)
    assert batch.block_overflow.sum() > 0
    # per-block valid edges never exceed the cap
    for b in layout.blocks:
        assert np.asarray(batch.edge_mask[b.start:b.stop]).sum() <= b.cap


def test_stack_batches(toy_csr):
    import numpy as np

    from pyhgt_tpu.graph.schema import PadSpec
    from pyhgt_tpu.sampling.batch import BatchLayout, pad_sample, stack_batches
    from pyhgt_tpu.sampling.hgsampler import HGSampler

    s = HGSampler(toy_csr, depth=1, width=4)
    layout = BatchLayout(
        schema=toy_csr.schema, pad=PadSpec(node_cap=32, default_edge_cap=16)
    )
    batches = []
    for i in range(3):
        rng = np.random.default_rng(i)
        raw = s.sample_raw({"paper": np.array([[i, 2019]])}, rng=rng)
        feats = {
            t: np.asarray(toy_csr.features[t]["emb"])[ids]
            for t, ids in raw.node_ids.items() if len(ids)
        }
        batches.append(pad_sample(raw, layout, feats, rng=rng))
    stacked = stack_batches(batches)
    assert stacked.node_feat.shape[0] == 3
    assert stacked.edge_src.shape == (3, layout.num_edges)
