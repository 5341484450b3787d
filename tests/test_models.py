"""Model-layer tests: shapes, masking invariants, conv dispatch, heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.models import GNN, Classifier, Matcher, GeneralConv
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.sampling.batch import BatchLayout


@pytest.fixture(scope="module")
def layout():
    schema = GraphSchema(
        node_types=("paper", "author", "venue"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("venue", "paper", "PV_in"),
            MetaRelation("paper", "venue", "rev_PV_in"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    return BatchLayout(schema=schema, pad=PadSpec(node_cap=16, default_edge_cap=32))


def _rand_batch(layout, rng, din=12):
    T, C = layout.num_types, layout.node_cap
    n_valid = [10, 8, 4]
    x = np.zeros((T, C, din), dtype=np.float32)
    node_mask = np.zeros((T, C), dtype=bool)
    for t, n in enumerate(n_valid):
        x[t, :n] = rng.normal(size=(n, din))
        node_mask[t, :n] = True
    E = layout.num_edges
    es = np.zeros(E, np.int32)
    et = np.zeros(E, np.int32)
    dt = np.full(E, 120, np.int32)
    mask = np.zeros(E, bool)
    for b in layout.blocks:
        for j in range(min(8, b.cap, n_valid[b.tgt_type_id], n_valid[b.src_type_id])):
            i = b.start + j
            et[i] = b.tgt_type_id * C + rng.integers(0, n_valid[b.tgt_type_id])
            es[i] = b.src_type_id * C + rng.integers(0, n_valid[b.src_type_id])
            dt[i] = rng.integers(0, 240)
            mask[i] = True
    return x, es, et, dt, mask, node_mask


@pytest.mark.parametrize("conv_name", ["hgt", "dense_hgt", "gcn", "gat", "rgcn", "han", "hetgnn"])
def test_gnn_forward_shapes_and_mask(layout, rng, conv_name):
    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    model = GNN(
        in_dim=12, n_hid=16, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
        conv_name=conv_name, prev_norm=True, last_norm=True,
    )
    params = model.init(jax.random.key(0), x, es, et, dt, mask, node_mask, em)
    out = model.apply(params, x, es, et, dt, mask, node_mask, em)
    assert out.shape == (layout.num_types, layout.node_cap, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    # padded nodes produce exactly zero
    assert np.all(np.asarray(out)[~node_mask] == 0)


def test_rgcn_matches_numpy_oracle(layout, rng):
    """RGCNConv == an independent f64 evaluation of its stated equation
    out_i = relu((Σ_e W_r(e) x_src(e)) / deg_i + b) — pins the per-block
    relation-transform indexing against the flat edge layout (VERDICT
    round-1 'extra convs are shape-tested only')."""
    from pyhgt_tpu.models.conv import RGCNConv

    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    T, C, Din = x.shape
    Dout = 20
    conv = RGCNConv(in_dim=Din, out_dim=Dout,
                    num_relations=layout.schema.num_relations)
    params = conv.init(jax.random.key(1), x, es, et, dt, mask, node_mask, em)
    got = np.asarray(
        conv.apply(params, x, es, et, dt, mask, node_mask, em), np.float64
    )

    w_rel = np.asarray(params["params"]["w_rel"], np.float64)
    b = np.asarray(params["params"]["b"], np.float64)
    xf = x.reshape(T * C, Din).astype(np.float64)
    rel = np.asarray(em.edge_rel)
    acc = np.zeros((T * C, Dout))
    deg = np.zeros(T * C)
    for i in np.flatnonzero(mask):
        acc[et[i]] += xf[es[i]] @ w_rel[rel[i]]
        deg[et[i]] += 1
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    ref = np.maximum(acc * inv[:, None] + b, 0.0).reshape(T, C, Dout)
    ref = ref * node_mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_han_matches_numpy_oracle(layout, rng):
    """HANConv == an independent f64 evaluation of its stated equations
    (per-relation GAT attention, per-(target, relation) softmax, semantic
    attention over relations)."""
    from pyhgt_tpu.models.conv import HANConv

    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    T, C, Din = x.shape
    Dout, H = 16, 4
    dk = Dout // H
    R = layout.schema.num_relations
    conv = HANConv(in_dim=Din, out_dim=Dout, num_relations=R, n_heads=H,
                   sem_dim=8)
    params = conv.init(jax.random.key(2), x, es, et, dt, mask, node_mask, em)
    got = np.asarray(
        conv.apply(params, x, es, et, dt, mask, node_mask, em), np.float64
    )

    P = params["params"]
    W = np.asarray(P["Dense_0"]["kernel"], np.float64)
    a_src = np.asarray(P["a_src"], np.float64)
    a_tgt = np.asarray(P["a_tgt"], np.float64)
    Wp = np.asarray(P["Dense_1"]["kernel"], np.float64)
    bp = np.asarray(P["Dense_1"]["bias"], np.float64)
    q = np.asarray(P["sem_q"], np.float64)

    N = T * C
    rel = np.asarray(em.edge_rel)
    h = (x.reshape(N, Din).astype(np.float64) @ W).reshape(N, H, dk)
    e = np.zeros((len(es), H))
    for i in np.flatnonzero(mask):
        e[i] = (h[es[i]] * a_src[rel[i]]).sum(-1) + (
            h[et[i]] * a_tgt[rel[i]]).sum(-1)
    e = np.where(e > 0, e, 0.2 * e)  # leaky relu
    h_rel = np.zeros((N, R, Dout))
    for n in range(N):
        for r in range(R):
            idx = np.flatnonzero(mask & (et == n) & (rel == r))
            if len(idx) == 0:
                continue
            z = np.exp(e[idx] - e[idx].max(axis=0, keepdims=True))
            w = z / z.sum(axis=0, keepdims=True)
            h_rel[n, r] = (w[:, :, None] * h[es[idx]]).sum(0).reshape(Dout)
    proj = np.tanh(h_rel @ Wp + bp)
    nm = node_mask.reshape(N).astype(np.float64)
    scores = ((proj @ q)[:, :, 0] * nm[:, None]).sum(0) / max(nm.sum(), 1.0)
    beta = np.exp(scores - scores.max())
    beta = beta / beta.sum()
    ref = (h_rel * beta[None, :, None]).sum(1).reshape(T, C, Dout)
    ref = ref * node_mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_hetgnn_matches_numpy_oracle(layout, rng):
    """HetGNNConv == an independent f64 evaluation of its stated equations
    (per-source-type mean aggregation, type-level attention incl. the
    self embedding)."""
    from pyhgt_tpu.models.conv import HetGNNConv

    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    T, C, Din = x.shape
    Dout = 16
    conv = HetGNNConv(in_dim=Din, out_dim=Dout, num_types=T)
    params = conv.init(jax.random.key(3), x, es, et, dt, mask, node_mask, em)
    got = np.asarray(
        conv.apply(params, x, es, et, dt, mask, node_mask, em), np.float64
    )

    P = params["params"]
    W = np.asarray(P["Dense_0"]["kernel"], np.float64)
    bD = np.asarray(P["Dense_0"]["bias"], np.float64)
    a = np.asarray(P["a"], np.float64)
    N = T * C
    h = x.reshape(N, Din).astype(np.float64) @ W + bD
    stype = np.asarray(em.block_src)[np.asarray(em.edge_block)]
    agg = np.zeros((N, T, Dout))
    cnt = np.zeros((N, T))
    for i in np.flatnonzero(mask):
        agg[et[i], stype[i]] += h[es[i]]
        cnt[et[i], stype[i]] += 1
    agg = agg / np.maximum(cnt, 1.0)[:, :, None]
    cand = np.concatenate([h[:, None, :], agg], axis=1)      # [N, T+1, D]
    sc = (cand * h[:, None, :]) @ a                          # [N, T+1, 1]
    sc = np.where(sc > 0, sc, 0.2 * sc)
    z = np.exp(sc - sc.max(axis=1, keepdims=True))
    alpha = z / z.sum(axis=1, keepdims=True)
    ref = (alpha * cand).sum(axis=1).reshape(T, C, Dout)
    ref = ref * node_mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_gcn_gat_match_numpy_oracle(layout, rng):
    """GCN/GAT baselines == independent f64 evaluations of their stated
    equations (symmetric-degree norm; additive attention + per-target
    softmax)."""
    from pyhgt_tpu.models.conv import GATConv, GCNConv

    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    T, C, Din = x.shape
    N = T * C
    Dout = 16

    gcn = GCNConv(in_dim=Din, out_dim=Dout)
    p = gcn.init(jax.random.key(4), x, es, et, dt, mask, node_mask, em)
    got = np.asarray(
        gcn.apply(p, x, es, et, dt, mask, node_mask, em), np.float64)
    W = np.asarray(p["params"]["Dense_0"]["kernel"], np.float64)
    b = np.asarray(p["params"]["Dense_0"]["bias"], np.float64)
    h = x.reshape(N, Din).astype(np.float64) @ W + b
    deg = np.zeros(N)
    for i in np.flatnonzero(mask):
        deg[et[i]] += 1
    isq = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-12)), 0.0)
    ref = np.zeros((N, Dout))
    for i in np.flatnonzero(mask):
        ref[et[i]] += h[es[i]] * isq[et[i]] * isq[es[i]]
    ref = ref.reshape(T, C, Dout) * node_mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    H, dk = 4, Dout // 4
    gat = GATConv(in_dim=Din, out_dim=Dout, n_heads=H, dropout=0.0)
    p = gat.init(jax.random.key(5), x, es, et, dt, mask, node_mask, em)
    got = np.asarray(
        gat.apply(p, x, es, et, dt, mask, node_mask, em), np.float64)
    W = np.asarray(p["params"]["Dense_0"]["kernel"], np.float64)
    a_s = np.asarray(p["params"]["a_src"], np.float64)
    a_t = np.asarray(p["params"]["a_tgt"], np.float64)
    h = (x.reshape(N, Din).astype(np.float64) @ W).reshape(N, H, dk)
    e = np.zeros((len(es), H))
    for i in np.flatnonzero(mask):
        e[i] = (h[es[i]] * a_s).sum(-1) + (h[et[i]] * a_t).sum(-1)
    e = np.where(e > 0, e, 0.2 * e)
    ref = np.zeros((N, H, dk))
    for n in range(N):
        idx = np.flatnonzero(mask & (et == n))
        if len(idx) == 0:
            continue
        z = np.exp(e[idx] - e[idx].max(axis=0, keepdims=True))
        w = z / z.sum(axis=0, keepdims=True)
        ref[n] = (w[:, :, None] * h[es[idx]]).sum(0)
    ref = ref.reshape(T, C, Dout) * node_mask[..., None]
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_gnn_padding_invariance(layout, rng):
    """Garbage in padded node slots must not change valid outputs."""
    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    model = GNN(
        in_dim=12, n_hid=16, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
    )
    params = model.init(jax.random.key(0), x, es, et, dt, mask, node_mask, em)
    out1 = model.apply(params, x, es, et, dt, mask, node_mask, em)
    x2 = x.copy()
    x2[~node_mask] = 999.0
    out2 = model.apply(params, x2, es, et, dt, mask, node_mask, em)
    np.testing.assert_allclose(
        np.asarray(out1)[node_mask], np.asarray(out2)[node_mask], rtol=1e-5, atol=1e-5
    )


def test_unimplemented_conv_raises(layout):
    with pytest.raises(NotImplementedError):
        GeneralConv(
            conv_name="nope", in_dim=8, out_dim=8, num_types=1,
            num_relations=1, n_heads=1,
        ).init(jax.random.key(0))


def test_attention_weights_sum_to_one(layout, rng):
    from pyhgt_tpu.models import HGTConv
    from pyhgt_tpu.sampling.batch import SubgraphBatch
    from pyhgt_tpu.sampling.sorted_batch import sort_batch

    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    conv = HGTConv(
        in_dim=12, out_dim=12, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4,
    )
    params = conv.init(jax.random.key(0), x, es, et, dt, mask, node_mask, em)
    w = np.asarray(conv.apply(
        params, x, es, et, dt, mask, node_mask, em,
        method=HGTConv.attention_weights,
    ))
    # weights over each target's incoming edges sum to 1 (reference
    # segment-softmax semantics)
    N = layout.num_types * layout.node_cap
    sums = np.zeros((N, 4))
    np.add.at(sums, et, w)
    has_edges = np.zeros(N, bool)
    has_edges[et[mask]] = True
    np.testing.assert_allclose(sums[has_edges], 1.0, rtol=1e-4)
    np.testing.assert_allclose(w[~mask], 0.0)

    # sorted path agrees (up to edge reordering)
    sub = SubgraphBatch(
        node_feat=x, node_time=np.zeros_like(node_mask, np.int32),
        node_mask=node_mask, edge_src=es, edge_tgt=et, edge_dt=dt,
        edge_mask=mask, block_overflow=np.zeros(1, np.int32),
    )
    se = sort_batch(sub, layout, em)
    w2 = np.asarray(conv.apply(
        params, x, es, et, dt, mask, node_mask, em, se,
        method=HGTConv.attention_weights,
    ))
    assert w2.shape[1] == 4
    np.testing.assert_allclose(
        np.sort(w2[se.edge_mask].ravel()), np.sort(w[mask].ravel()),
        rtol=2e-3, atol=1e-5,
    )


def test_classifier_log_softmax(rng):
    x = rng.normal(size=(5, 8)).astype(np.float32)
    m = Classifier(n_out=7)
    p = m.init(jax.random.key(0), x)
    out = np.asarray(m.apply(p, x))
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, rtol=1e-4)


def test_matcher_pair_vs_matrix(rng):
    x = rng.normal(size=(6, 8)).astype(np.float32)
    y = rng.normal(size=(6, 8)).astype(np.float32)
    m = Matcher(n_hid=8)
    p = m.init(jax.random.key(0), x, y)
    pair = np.asarray(m.apply(p, x, y, pair=True))
    full = np.asarray(m.apply(p, x, y, pair=False))
    np.testing.assert_allclose(pair, np.diag(full), rtol=1e-5, atol=1e-6)
    # explicit cache path == direct path
    tx = m.apply(p, x, method=Matcher.left)
    ty = m.apply(p, y, method=Matcher.right)
    cached = np.asarray(m.apply(p, tx, ty, method=Matcher.score_cached))
    np.testing.assert_allclose(cached, full, rtol=1e-5, atol=1e-6)


def test_dropout_active_in_training_mode(layout, rng):
    em = EdgeStaticMeta.from_layout(layout)
    x, es, et, dt, mask, node_mask = _rand_batch(layout, rng)
    model = GNN(
        in_dim=12, n_hid=16, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=1,
        dropout=0.5,
    )
    params = model.init(jax.random.key(0), x, es, et, dt, mask, node_mask, em)
    o1 = model.apply(
        params, x, es, et, dt, mask, node_mask, em, False,
        rngs={"dropout": jax.random.key(1)},
    )
    o2 = model.apply(
        params, x, es, et, dt, mask, node_mask, em, False,
        rngs={"dropout": jax.random.key(2)},
    )
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_empty_type_batch_is_safe(layout, rng):
    """A batch where one node type has zero valid nodes must stay finite
    on both edge paths (padded LayerNorm / empty segments are the risk)."""
    from pyhgt_tpu.sampling.batch import SubgraphBatch
    from pyhgt_tpu.sampling.sorted_batch import sort_batch

    em = EdgeStaticMeta.from_layout(layout)
    T, C = layout.num_types, layout.node_cap
    din = 12
    x = np.zeros((T, C, din), np.float32)
    node_mask = np.zeros((T, C), bool)
    x[0, :4] = rng.normal(size=(4, din))
    node_mask[0, :4] = True  # only papers; authors/venues empty
    E = layout.num_edges
    es = np.zeros(E, np.int32)
    et = np.zeros(E, np.int32)
    dt = np.full(E, 120, np.int32)
    mask = np.zeros(E, bool)
    for b in layout.blocks:  # only paper-paper blocks get edges
        if b.tgt_type_id == 0 and b.src_type_id == 0:
            for j in range(min(4, b.cap)):
                i = b.start + j
                et[i] = rng.integers(0, 4)
                es[i] = rng.integers(0, 4)
                mask[i] = True
    model = GNN(
        in_dim=din, n_hid=16, num_types=T,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
        prev_norm=True, last_norm=True,
    )
    params = model.init(jax.random.key(0), x, es, et, dt, mask, node_mask, em)
    out = model.apply(params, x, es, et, dt, mask, node_mask, em)
    assert np.isfinite(np.asarray(out)).all()

    model_s = GNN(
        in_dim=din, n_hid=16, num_types=T,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
        prev_norm=True, last_norm=True, edge_impl="sorted",
    )
    sub = SubgraphBatch(
        node_feat=x, node_time=np.zeros((T, C), np.int32), node_mask=node_mask,
        edge_src=es, edge_tgt=et, edge_dt=dt, edge_mask=mask,
        block_overflow=np.zeros(1, np.int32),
    )
    se = sort_batch(sub, layout, em)
    params_s = model_s.init(
        jax.random.key(0), x, es, et, dt, mask, node_mask, em, se=se
    )
    out_s = model_s.apply(params_s, x, es, et, dt, mask, node_mask, em, se=se)
    assert np.isfinite(np.asarray(out_s)).all()


def test_param_count_matches_published_reference():
    """The reference publishes 21,173,389 params for the ogbn-mag recipe
    (4 layers, n_hid 512, 8 heads, prev+last norm, RTE;
    ``ogbn-mag/README.md:28-30``). Our trainable parameters match
    one-for-one; the only difference is the frozen RTE sinusoidal table
    (4 x 240 x 512 = 491,520), which the reference counts as parameters
    (its requires_grad=False quirk, ``pyHGT/conv.py:295``) but is a
    compile-time constant here."""
    from pyhgt_tpu.flagship import flagship_schema
    from pyhgt_tpu.models import NodeClassifierModel
    from pyhgt_tpu.sampling.batch import BatchLayout
    from pyhgt_tpu.utils.experiment import get_n_params
    from pyhgt_tpu.utils.synth import synth_batch

    T, R, H, L = 4, 9, 8, 4
    Din, D, C = 129, 512, 349
    schema = flagship_schema()
    layout_ = BatchLayout(
        schema=schema, pad=PadSpec(node_cap=16, default_edge_cap=32)
    )
    em = EdgeStaticMeta.from_layout(layout_)
    batch = synth_batch(layout_, np.random.default_rng(0), din=Din,
                        node_fill=0.5, edge_fill=0.5)
    model = NodeClassifierModel(
        gnn_kwargs=dict(in_dim=Din, n_hid=D, num_types=T, num_relations=R,
                        n_heads=H, n_layers=L, prev_norm=True,
                        last_norm=True, use_rte=True),
        n_classes=C, target_type_id=0, head_mode="full",
    )
    params = model.init(
        jax.random.key(0), batch.node_feat, batch.edge_src, batch.edge_tgt,
        batch.edge_dt, batch.edge_mask, batch.node_mask, em,
    )
    frozen_rte_tables = L * 240 * D
    assert get_n_params(params) + frozen_rte_tables == 21_173_389
