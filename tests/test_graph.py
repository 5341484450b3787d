"""Graph container / schema / CSR tests (parity targets: pyHGT/data.py:19-83)."""

import numpy as np
import pytest

from pyhgt_tpu.graph import CSRGraph, Graph, GraphSchema
from pyhgt_tpu.graph.container import NO_TIME, edge_iter


def test_add_node_interning():
    g = Graph()
    a = g.add_node({"id": "x", "type": "paper"})
    b = g.add_node({"id": "y", "type": "paper"})
    c = g.add_node({"id": "x", "type": "paper"})  # duplicate
    d = g.add_node({"id": "x", "type": "author"})  # other type namespace
    assert (a, b, c, d) == (0, 1, 0, 0)
    assert g.num_nodes("paper") == 2 and g.num_nodes("author") == 1


def test_add_edge_auto_reverse():
    g = Graph()
    p = {"id": "p0", "type": "paper"}
    a = {"id": "a0", "type": "author"}
    g.add_edge(a, p, time=2010, relation_type="AP_write")
    # forward edge indexed [target_type][source_type][rel][tgt][src]
    assert g.edge_list["paper"]["author"]["AP_write"][0][0] == 2010
    # auto reverse with rev_ prefix (pyHGT/data.py:59-63)
    assert g.edge_list["author"]["paper"]["rev_AP_write"][0][0] == 2010
    assert 2010 in g.times


def test_add_edge_undirected():
    g = Graph()
    u = {"id": "f0", "type": "field"}
    v = {"id": "f1", "type": "field"}
    g.add_edge(u, v, time=None, relation_type="FF_in", directed=False)
    # u interned first (id 0), v second (id 1); forward edge tgt=v, src=u
    assert g.edge_list["field"]["field"]["FF_in"][1][0] is None
    # both directions share the same relation name
    rels = g.edge_list["field"]["field"]
    assert set(rels.keys()) == {"FF_in"}
    assert len(list(edge_iter(g, "field", "field", "FF_in"))) == 2


def test_update_node_merges_attrs():
    g = Graph()
    g.add_node({"id": "p0", "type": "paper", "title": "t"})
    g.update_node({"id": "p0", "type": "paper", "year": 2001, "title": "other"})
    attrs = g.node_attrs["paper"][0]
    assert attrs["year"] == 2001
    assert attrs["title"] == "t"  # existing keys win (pyHGT/data.py:69-71)


def test_meta_graph_and_schema(toy_graph):
    metas = toy_graph.get_meta_graph()
    assert ("paper", "author", "AP_write") in metas
    assert ("author", "paper", "rev_AP_write") in metas
    schema = GraphSchema.from_graph(toy_graph)
    assert schema.num_relations == len(metas) + 1
    # relation-name dedup: self id == number of distinct names
    names = {m[2] for m in metas}
    assert schema.self_rel_id == len(names)
    assert schema.rel_id("self") == schema.self_rel_id


def test_csr_roundtrip(toy_graph):
    csr = toy_graph.freeze()
    # every build-time edge must appear in CSR and vice versa
    for m in csr.schema.metas:
        key = m.as_tuple()
        rows = toy_graph.edge_list[m.tgt_type][m.src_type][m.rel]
        want = {(t, s) for t, srcs in rows.items() for s in srcs}
        got = set()
        adj = csr.adj[key]
        for t in range(csr.num_nodes[m.tgt_type]):
            srcs, times = adj.row(t)
            for s, tm in zip(srcs, times):
                got.add((t, int(s)))
                orig = rows[t][int(s)]
                assert (NO_TIME if orig is None else orig) == tm
        assert got == want


def test_csr_from_arrays():
    schema = GraphSchema(
        node_types=("a", "b"),
        metas=(
            __import__("pyhgt_tpu.graph.schema", fromlist=["MetaRelation"]).MetaRelation("b", "a", "r"),
        ),
    )
    tgt = np.array([2, 0, 2, 1])
    src = np.array([0, 1, 2, 0])
    time = np.array([5, 6, 7, 8])
    csr = CSRGraph.from_arrays(
        schema, {"a": 3, "b": 3}, {("b", "a", "r"): (tgt, src, time)}
    )
    srcs, times = csr.neighbors(("b", "a", "r"), 2)
    assert sorted(srcs.tolist()) == [0, 2]
    assert csr.num_edges() == 4


def test_csr_save_load(tmp_path, toy_csr):
    p = tmp_path / "g.pk"
    toy_csr.save(str(p))
    g2 = CSRGraph.load(str(p))
    assert g2.num_edges() == toy_csr.num_edges()
    assert g2.schema == toy_csr.schema


def test_csr_dir_roundtrip_mmap(toy_csr, tmp_path):
    """save_dir/load_dir with memory-mapping preserves everything."""
    import numpy as np

    toy_csr.aux["y"] = np.arange(toy_csr.num_nodes["paper"])
    d = str(tmp_path / "gdir")
    toy_csr.save_dir(d)
    g2 = type(toy_csr).load_dir(d, mmap=True)
    assert g2.num_nodes == toy_csr.num_nodes
    assert len(g2.schema.metas) == len(toy_csr.schema.metas)
    for m in toy_csr.schema.metas:
        a, b = toy_csr.adj[m.as_tuple()], g2.adj[m.as_tuple()]
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.src, b.src)
        np.testing.assert_array_equal(a.time, b.time)
    np.testing.assert_array_equal(
        g2.features["paper"]["emb"], toy_csr.features["paper"]["emb"]
    )
    np.testing.assert_array_equal(g2.aux["y"], toy_csr.aux["y"])
    # sampler runs off the mmap'd arrays
    from pyhgt_tpu.sampling.hgsampler import HGSampler

    s = HGSampler(g2, depth=2, width=4)
    raw = s.sample_raw({"paper": np.array([[0, 2015]])})
    assert len(raw.node_ids["paper"]) >= 1
