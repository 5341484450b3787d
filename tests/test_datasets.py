"""Dataset-layer tests: propagation, feature extractors, ogbn assembly,
reference-pickle conversion."""

import pickle

import numpy as np
import pytest

from pyhgt_tpu.datasets import (
    feature_mag,
    feature_oag,
    normalize_rows,
    propagate_features,
)
from pyhgt_tpu.datasets.ogbn_mag import build_from_arrays


def test_normalize_rows():
    import scipy.sparse as sp

    m = sp.csr_matrix(np.array([[1.0, 1.0, 2.0], [0, 0, 0], [3.0, 0, 0]]))
    out = normalize_rows(m).toarray()
    np.testing.assert_allclose(out[0], [0.25, 0.25, 0.5])
    np.testing.assert_allclose(out[1], 0.0)
    np.testing.assert_allclose(out[2], [1.0, 0, 0])


def test_propagate_features_mean():
    src_feat = np.array([[1.0, 0], [3.0, 2.0], [5.0, 4.0]], dtype=np.float32)
    tgt = np.array([0, 0, 1])
    src = np.array([0, 1, 2])
    out = propagate_features((tgt, src), src_feat, n_tgt=3)
    np.testing.assert_allclose(out[0], [2.0, 1.0])
    np.testing.assert_allclose(out[1], [5.0, 4.0])
    np.testing.assert_allclose(out[2], 0.0)


def test_feature_extractors(toy_csr):
    ids = np.array([0, 3, 5])
    f = feature_mag(toy_csr, "paper", ids)
    assert f.shape == (3, 16)
    # OAG concat: emb(16) + node_emb(400 zeros) + citation(1)
    toy_csr.features["paper"]["citation"] = np.arange(
        toy_csr.num_nodes["paper"], dtype=np.float64
    )
    f2 = feature_oag(toy_csr, "paper", ids)
    assert f2.shape == (3, 400 + 16 + 1)
    np.testing.assert_allclose(f2[:, :400], 0.0)
    np.testing.assert_allclose(f2[:, -1], np.log10(ids + 0.01), rtol=1e-5)


def test_texts_oag(toy_csr):
    """feature_OAG's `texts` output (pyHGT/utils.py:68-69): sampled papers'
    titles in sample order."""
    from pyhgt_tpu.datasets.features import texts_oag

    n = toy_csr.num_nodes["paper"]
    toy_csr.features["paper"]["title"] = np.array(
        [f"paper {i}" for i in range(n)]
    )

    class FakeSample:
        node_ids = {"paper": np.array([4, 0, 2])}

    t = texts_oag(toy_csr, FakeSample())
    assert list(t) == ["paper 4", "paper 0", "paper 2"]
    # graceful when titles are absent
    del toy_csr.features["paper"]["title"]
    assert texts_oag(toy_csr, FakeSample()).size == 0


def test_ogbn_build_from_arrays():
    rng = np.random.default_rng(0)
    nP, nA, nF, nI = 30, 12, 6, 3
    edge_index = {
        ("author", "writes", "paper"): np.stack(
            [rng.integers(0, nA, 50), rng.integers(0, nP, 50)]
        ),
        ("paper", "cites", "paper"): np.stack(
            [rng.integers(0, nP, 40), rng.integers(0, nP, 40)]
        ),
        ("paper", "has_topic", "field_of_study"): np.stack(
            [rng.integers(0, nP, 45), rng.integers(0, nF, 45)]
        ),
        ("author", "affiliated_with", "institution"): np.stack(
            [rng.integers(0, nA, 15), rng.integers(0, nI, 15)]
        ),
    }
    csr = build_from_arrays(
        edge_index=edge_index,
        num_nodes={"paper": nP, "author": nA, "field_of_study": nF,
                   "institution": nI},
        paper_x=rng.normal(size=(nP, 8)).astype(np.float32),
        years=rng.integers(2000, 2020, nP),
        y=rng.integers(0, 5, nP),
        split={"train": np.arange(0, 20), "valid": np.arange(20, 25),
               "test": np.arange(25, 30)},
    )
    # forward + reverse metas
    assert len(csr.schema.metas) == 8
    # features: paper x+logdeg; others propagated+logdeg
    assert csr.features["paper"]["emb"].shape == (nP, 9)
    assert csr.features["author"]["emb"].shape == (nA, 9)
    assert csr.features["institution"]["emb"].shape == (nI, 9)
    assert np.isfinite(csr.features["institution"]["emb"]).all()
    # masks partition correctly
    aux = csr.aux
    assert aux["train_mask"].sum() == 20
    assert aux["test_mask"].sum() == 5
    assert not (aux["train_mask"] & aux["test_mask"]).any()
    # edges timestamped by the paper endpoint's year
    adj = csr.adj[("paper", "author", "writes")]
    years = aux["years"]
    for tgt in range(nP):
        srcs, times = adj.row(tgt)
        if len(srcs):
            assert (times == years[tgt]).all()
    # sampler runs end-to-end on the built graph
    from pyhgt_tpu.sampling.hgsampler import HGSampler

    s = HGSampler(csr, depth=2, width=4)
    raw = s.sample_raw({"paper": np.stack([np.arange(4), years[:4]], 1)})
    assert len(raw.node_ids["paper"]) >= 4


def test_reference_pickle_roundtrip(tmp_path):
    """A plain-pickled object shaped like a reference Graph converts."""
    from pyhgt_tpu.datasets.convert import convert_reference_pickle

    class FakeRef:
        pass

    ref = FakeRef()
    ref.node_forward = {"paper": {f"p{i}": i for i in range(4)},
                        "venue": {"v0": 0}}
    ref.node_bacward = {"paper": [{"id": f"p{i}", "type": "paper"} for i in range(4)],
                        "venue": [{"id": "v0", "type": "venue"}]}
    ref.edge_list = {
        "venue": {"paper": {"PV_in": {0: {0: 2010, 1: 2011}}}},
        "paper": {"venue": {"rev_PV_in": {0: {0: 2010}, 1: {0: 2011}}}},
    }
    ref.times = {2010: True, 2011: True}
    ref.node_feature = {
        "paper": {"emb": np.ones((4, 3), np.float32)},
        "venue": {"emb": np.zeros((1, 3), np.float32)},
    }
    # emulate the reference pickle by renaming the class module/name
    # (GPT_GNN.data exercises the sibling-repo remap, pyHGT/data.py:263-265)
    FakeRef.__module__ = "GPT_GNN.data"
    FakeRef.__qualname__ = FakeRef.__name__ = "Graph"
    import sys, types

    mod = types.ModuleType("GPT_GNN")
    mod_data = types.ModuleType("GPT_GNN.data")
    mod_data.Graph = FakeRef
    sys.modules["GPT_GNN"] = mod
    sys.modules["GPT_GNN.data"] = mod_data
    try:
        p = tmp_path / "g.pk"
        with open(p, "wb") as f:
            pickle.dump(ref, f)
    finally:
        del sys.modules["GPT_GNN"], sys.modules["GPT_GNN.data"]

    csr = convert_reference_pickle(str(p))
    assert csr.num_nodes == {"paper": 4, "venue": 1}
    assert ("venue", "paper", "PV_in") in csr.adj
    assert csr.adj[("venue", "paper", "PV_in")].nnz == 2
    srcs, times = csr.adj[("paper", "venue", "rev_PV_in")].row(1)
    assert list(srcs) == [0] and list(times) == [2011]
