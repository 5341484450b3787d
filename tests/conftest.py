"""Test configuration: run JAX on an 8-device virtual CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests emulate an
8-device mesh on CPU (SURVEY.md §4 item 4). Must run before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force cpu via
# config so tests run on the 8-device virtual mesh, not the tunneled chip.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float64 references; the environment default
# lowers f32 matmuls to bf16 passes (fine for training throughput, fatal
# for allclose tests).
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_toy_graph(
    n_paper=40, n_author=25, n_venue=6, seed=0, with_times=True
):
    """A small OAG-shaped graph: paper--author, paper--venue, paper cites."""
    from pyhgt_tpu.graph import Graph

    r = np.random.default_rng(seed)
    g = Graph()
    papers = [{"id": f"p{i}", "type": "paper"} for i in range(n_paper)]
    authors = [{"id": f"a{i}", "type": "author"} for i in range(n_author)]
    venues = [{"id": f"v{i}", "type": "venue"} for i in range(n_venue)]
    years = r.integers(2000, 2020, size=n_paper)
    for i, p in enumerate(papers):
        t = int(years[i]) if with_times else None
        for a in r.choice(n_author, size=r.integers(1, 4), replace=False):
            g.add_edge(authors[a], p, time=t, relation_type="AP_write")
        v = int(r.integers(0, n_venue))
        g.add_edge(p, venues[v], time=t, relation_type="PV_in")
        for j in r.choice(n_paper, size=r.integers(0, 3), replace=False):
            if j != i:
                g.add_edge(papers[int(j)], p, time=t, relation_type="PP_cite")
    for t, n in (("paper", n_paper), ("author", n_author), ("venue", n_venue)):
        g.set_features(t, {"emb": r.normal(size=(n, 16)).astype(np.float32)})
    # author names with collisions (author-disambiguation fixtures)
    g.node_feature["author"]["name"] = np.array(
        [f"name{i % 4}" for i in range(n_author)]
    )
    return g


@pytest.fixture
def toy_graph():
    return make_toy_graph()


@pytest.fixture
def toy_csr(toy_graph):
    return toy_graph.freeze()
