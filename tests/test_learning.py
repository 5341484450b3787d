"""End-to-end learnability: on a community-structured synthetic graph the
full stack (sampler → padded batches → sorted path → HGT → head) must
beat chance by a wide margin within a few epochs."""

import numpy as np
import pytest

from pyhgt_tpu.config import ExperimentConfig
from pyhgt_tpu.experiments import run_node_classification
from pyhgt_tpu.graph.container import Graph


def make_community_graph(n_comm=4, papers_per=40, authors_per=12, seed=0):
    """Papers/authors split into communities; venue == community; paper
    features = community centroid + noise, so venue is learnable from
    features AND from the co-author/citation structure."""
    r = np.random.default_rng(seed)
    g = Graph()
    dim = 16
    centroids = r.normal(size=(n_comm, dim)) * 3
    papers, authors, venues = [], [], []
    feats = []
    for c in range(n_comm):
        venues.append({"id": f"v{c}", "type": "venue"})
    for c in range(n_comm):
        for i in range(authors_per):
            authors.append({"id": f"a{c}_{i}", "type": "author", "comm": c})
    for c in range(n_comm):
        for i in range(papers_per):
            p = {"id": f"p{c}_{i}", "type": "paper", "comm": c}
            papers.append(p)
            feats.append(centroids[c] + r.normal(size=dim))
    years = r.integers(2000, 2020, size=len(papers))
    for idx, p in enumerate(papers):
        c = p["comm"]
        t = int(years[idx])
        g.add_edge(p, venues[c], time=t, relation_type="PV_in")
        for a in r.choice(authors_per, size=2, replace=False):
            g.add_edge(
                authors[c * authors_per + a], p, time=t,
                relation_type="AP_write",
            )
        j = int(r.integers(0, papers_per))
        if j != idx % papers_per:
            g.add_edge(
                papers[c * papers_per + j], p, time=t, relation_type="PP_cite"
            )
    g.set_features("paper", {"emb": np.asarray(feats, np.float32)})
    g.set_features(
        "author", {"emb": r.normal(size=(len(authors), 16)).astype(np.float32)}
    )
    g.set_features(
        "venue", {"emb": r.normal(size=(n_comm, 16)).astype(np.float32)}
    )
    return g.freeze()


@pytest.mark.slow
@pytest.mark.parametrize("conv_name", ["rgcn", "han", "hetgnn"])
def test_extra_convs_learn_community_venue(tmp_path, conv_name):
    """The beyond-reference convs (which the reference CLI advertises but
    never implements, ``/root/reference/OAG/train_paper_field.py:26-28``)
    must actually LEARN, not just produce shapes: on the community graph
    each clears chance NDCG (~0.56) by a wide margin with a falling loss."""
    csr = make_community_graph()
    cfg = ExperimentConfig(
        task_name=f"community_{conv_name}", model_dir=str(tmp_path),
        conv_name=conv_name,
        n_hid=32, n_heads=4, n_layers=2, sample_depth=2, sample_width=16,
        batch_size=16, n_batch=4, repeat=1, n_pool=2, n_epoch=6,
        node_cap=128, edge_cap=256, native_sampler=False, max_lr=5e-3,
        dropout=0.1,
    )
    out = run_node_classification(
        cfg, csr, label_meta=("venue", "paper", "PV_in"), multi_label=True,
        log=lambda s: None,
    )
    assert out["test_ndcg"] > 0.75, (conv_name, out["test_ndcg"])
    assert out["history"][-1]["loss"] < out["history"][0]["loss"]


@pytest.mark.slow
def test_learns_community_venue(tmp_path):
    csr = make_community_graph()
    cfg = ExperimentConfig(
        task_name="community", model_dir=str(tmp_path),
        n_hid=32, n_heads=4, n_layers=2, sample_depth=2, sample_width=16,
        batch_size=16, n_batch=4, repeat=1, n_pool=2, n_epoch=6,
        node_cap=128, edge_cap=256, native_sampler=False, max_lr=5e-3,
        dropout=0.1,
    )
    out = run_node_classification(
        cfg, csr, label_meta=("venue", "paper", "PV_in"), multi_label=True,
        log=lambda s: None,
    )
    # 4 communities -> random NDCG over a 4-class multi-hot with one hot
    # is ~0.56; learned should clear 0.8
    assert out["test_ndcg"] > 0.8, out["test_ndcg"]
    assert out["history"][-1]["loss"] < out["history"][0]["loss"]
