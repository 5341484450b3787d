"""Unit tests for the ops layer (SURVEY.md §4 item 1).

The HGT core test validates the TPU decomposition (node-level projections,
per-block relation transforms, 240-row RTE tables — ops/hgt.py) against a
direct per-edge evaluation of the reference equations
(/root/reference/pyHGT/conv.py:60-111), written independently from the math.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.ops.hgt import EdgeStaticMeta, hgt_conv_core
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.ops.segment import segment_softmax, segment_sum
from pyhgt_tpu.sampling.batch import BatchLayout


# ---------------------------------------------------------------- segment ops
def test_segment_sum_masked(rng):
    data = rng.normal(size=(10, 3)).astype(np.float32)
    seg = np.array([0, 0, 1, 1, 1, 2, 2, 3, 3, 3])
    mask = np.array([1, 1, 1, 0, 1, 1, 1, 0, 0, 1], dtype=bool)
    out = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), 5, jnp.asarray(mask)))
    for s in range(5):
        exp = data[(seg == s) & mask].sum(axis=0) if ((seg == s) & mask).any() else 0.0
        np.testing.assert_allclose(out[s], exp, rtol=1e-6, atol=1e-6)


def test_segment_softmax_matches_numpy(rng):
    E, H = 64, 4
    scores = rng.normal(size=(E, H)).astype(np.float32) * 3
    seg = np.sort(rng.integers(0, 10, size=E))
    mask = rng.random(E) > 0.2
    w = np.asarray(
        segment_softmax(jnp.asarray(scores), jnp.asarray(seg), 12, jnp.asarray(mask))
    )
    # per-segment: masked-softmax
    for s in range(12):
        idx = (seg == s) & mask
        if not idx.any():
            assert np.all(w[seg == s] == 0)
            continue
        e = np.exp(scores[idx] - scores[idx].max(axis=0))
        np.testing.assert_allclose(w[idx], e / e.sum(axis=0), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(w[(seg == s) & ~mask], 0.0)
    # weights of non-empty segments sum to 1
    sums = np.zeros((12, H))
    np.add.at(sums, seg, w)
    for s in np.unique(seg[mask]):
        np.testing.assert_allclose(sums[s], 1.0, rtol=1e-5)


# ------------------------------------------------------------------- RTE table
def test_rte_table_closed_form():
    n_hid = 32
    tab = rte_sin_table(n_hid)
    assert tab.shape == (240, n_hid)
    # closed form at a few (t, i): sin/cos(t / 10000^(2i/n_hid)) / sqrt(n_hid)
    for t in (0, 1, 17, 239):
        for i in (0, 5, 15):
            freq = np.exp(2 * i * -(np.log(10000.0) / n_hid))
            np.testing.assert_allclose(
                tab[t, 2 * i], np.sin(t * freq) / np.sqrt(n_hid), rtol=1e-5, atol=1e-6
            )
            np.testing.assert_allclose(
                tab[t, 2 * i + 1], np.cos(t * freq) / np.sqrt(n_hid), rtol=1e-5, atol=1e-6
            )


# --------------------------------------------------------- HGT core vs naive
def _toy_layout():
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    pad = PadSpec(node_cap=16, default_edge_cap=32)
    return BatchLayout(schema=schema, pad=pad)


def _naive_reference_hgt(x, es, et, dt, mask, em, P, H, use_rte):
    """Direct per-edge evaluation of pyHGT/conv.py:60-111 in numpy."""
    T, C, Din = x.shape
    Dout = P["wq"].shape[-1]
    dk = Dout // H
    N = T * C
    xf = x.reshape(N, Din)
    rte = rte_sin_table(Din) @ P["rte_w"] + P["rte_b"] if use_rte else None
    E = len(es)
    att = np.full((E, H), -np.inf)
    msg = np.zeros((E, H, dk))
    for e in range(E):
        if not mask[e]:
            continue
        st = em.block_src[em.edge_block[e]]
        tt = em.block_tgt[em.edge_block[e]]
        r = em.edge_rel[e]
        xs = xf[es[e]].copy()
        if use_rte:
            xs = xs + rte[dt[e]]
        q = (xf[et[e]] @ P["wq"][tt] + P["bq"][tt]).reshape(H, dk)
        k = (xs @ P["wk"][st] + P["bk"][st]).reshape(H, dk)
        v = (xs @ P["wv"][st] + P["bv"][st]).reshape(H, dk)
        for h in range(H):
            kr = k[h] @ P["rel_att"][r, h]
            att[e, h] = (q[h] * kr).sum() * P["rel_pri"][r, h] / np.sqrt(dk)
            msg[e, h] = v[h] @ P["rel_msg"][r, h]
    # segment softmax by target
    w = np.zeros((E, H))
    for n in range(N):
        idx = np.where((et == n) & mask)[0]
        if len(idx) == 0:
            continue
        a = att[idx]
        ex = np.exp(a - a.max(axis=0))
        w[idx] = ex / ex.sum(axis=0)
    aggr = np.zeros((N, Dout))
    for e in range(E):
        if mask[e]:
            aggr[et[e]] += (w[e][:, None] * msg[e]).reshape(Dout)
    return aggr.reshape(T, C, Dout), w


@pytest.mark.parametrize("use_rte", [True, False])
def test_hgt_core_matches_naive_reference(rng, use_rte):
    layout = _toy_layout()
    em = EdgeStaticMeta.from_layout(layout)
    T, C = layout.num_types, layout.node_cap
    Din = Dout = 24
    H = 4
    R = layout.schema.num_relations
    N = T * C

    # random valid nodes + edges respecting block typing
    n_valid = {0: 12, 1: 9}
    x = np.zeros((T, C, Din), dtype=np.float32)
    for t, n in n_valid.items():
        x[t, :n] = rng.normal(size=(n, Din))
    E = layout.num_edges
    es = np.zeros(E, dtype=np.int32)
    et = np.zeros(E, dtype=np.int32)
    dt = np.zeros(E, dtype=np.int32)
    mask = np.zeros(E, dtype=bool)
    for b in layout.blocks:
        n_e = min(10, b.cap)
        tt, st = b.tgt_type_id, b.src_type_id
        for j in range(n_e):
            i = b.start + j
            et[i] = tt * C + rng.integers(0, n_valid[tt])
            es[i] = st * C + rng.integers(0, n_valid[st])
            dt[i] = rng.integers(0, 240)
            mask[i] = True

    P = {
        "wq": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bq": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wk": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bk": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wv": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bv": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "rel_pri": rng.normal(size=(R, H)).astype(np.float32) + 1,
        "rel_att": rng.normal(size=(R, H, Dout // H, Dout // H)).astype(np.float32) * 0.3,
        "rel_msg": rng.normal(size=(R, H, Dout // H, Dout // H)).astype(np.float32) * 0.3,
        "rte_w": rng.normal(size=(Din, Din)).astype(np.float32) * 0.3,
        "rte_b": rng.normal(size=(Din,)).astype(np.float32) * 0.1,
    }

    rte_vec = (
        jnp.asarray(rte_sin_table(Din)) @ P["rte_w"] + P["rte_b"] if use_rte else None
    )
    aggr, w = hgt_conv_core(
        jnp.asarray(x), jnp.asarray(es), jnp.asarray(et), jnp.asarray(dt),
        jnp.asarray(mask), em,
        wq=P["wq"], bq=P["bq"], wk=P["wk"], bk=P["bk"], wv=P["wv"], bv=P["bv"],
        rel_pri=P["rel_pri"], rel_att=P["rel_att"], rel_msg=P["rel_msg"],
        n_heads=H, rte_vec=rte_vec,
    )
    ref_aggr, ref_w = _naive_reference_hgt(x, es, et, dt, mask, em, P, H, use_rte)
    np.testing.assert_allclose(np.asarray(w), ref_w, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(aggr), ref_aggr.astype(np.float32), rtol=2e-4, atol=2e-4
    )
