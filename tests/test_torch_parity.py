"""Full-layer golden parity vs an independent PyTorch implementation.

BASELINE.json asks for per-layer activation parity (allclose) with the
torch reference. PyG/torch-scatter are not installed here, so this test
implements the reference HGTConv *equations* (``/root/reference/pyHGT/
conv.py:60-134``) directly in plain torch (no PyG), loads IDENTICAL
weights into our flax layer, and asserts the outputs agree — message
half (RTE, per-relation attention, segment softmax, aggregation) AND
update half (gelu → per-type A linear → sigmoid skip gate → per-type
LayerNorm).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.models import HGTConv
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.utils.synth import synth_batch


def torch_hgt_layer(x, es, et, dt, mask, em, P, H, T, C, use_rte=True):
    """Reference equations in plain torch (float64 for a gold standard)."""
    tt = lambda a: torch.tensor(np.asarray(a), dtype=torch.float64)
    E = len(es)
    N, Din = x.shape[0] * x.shape[1], x.shape[2]
    Dout = P["wq"].shape[-1]
    dk = Dout // H
    xf = tt(x).reshape(N, Din)
    rte = tt(rte_sin_table(Din)) @ tt(P["rte_w"]) + tt(P["rte_b"])

    att = torch.full((E, H), -1e30, dtype=torch.float64)
    msg = torch.zeros((E, H, dk), dtype=torch.float64)
    for e in range(E):
        if not mask[e]:
            continue
        st = em.block_src[em.edge_block[e]]
        tgt_t = em.block_tgt[em.edge_block[e]]
        r = em.edge_rel[e]
        xs = xf[es[e]].clone()
        if use_rte:
            xs = xs + rte[dt[e]]                       # conv.py:91-92
        q = (xf[et[e]] @ tt(P["wq"][tgt_t]) + tt(P["bq"][tgt_t])).view(H, dk)
        k = (xs @ tt(P["wk"][st]) + tt(P["bk"][st])).view(H, dk)
        v = (xs @ tt(P["wv"][st]) + tt(P["bv"][st])).view(H, dk)
        for h in range(H):
            kr = k[h] @ tt(P["rel_att"][r, h])         # conv.py:97-98
            att[e, h] = (q[h] * kr).sum() * float(P["rel_pri"][r, h]) / np.sqrt(dk)
            msg[e, h] = v[h] @ tt(P["rel_msg"][r, h])  # conv.py:103-104
    # segment softmax by target (conv.py:108)
    w = torch.zeros((E, H), dtype=torch.float64)
    for n in range(N):
        idx = [e for e in range(E) if et[e] == n and mask[e]]
        if not idx:
            continue
        a = att[idx]
        w[idx] = torch.softmax(a, dim=0)
    aggr = torch.zeros((N, Dout), dtype=torch.float64)
    for e in range(E):
        if mask[e]:
            aggr[et[e]] += (w[e].unsqueeze(-1) * msg[e]).reshape(Dout)
    # update half (conv.py:114-134), dropout off
    out = torch.zeros((N, Dout), dtype=torch.float64)
    for t in range(T):
        rows = slice(t * C, (t + 1) * C)
        trans = torch.nn.functional.gelu(aggr[rows]) @ tt(P["wa"][t]) + tt(P["ba"][t])
        alpha = torch.sigmoid(tt(P["skip"][t]))
        res = trans * alpha + tt(x[t]).to(torch.float64) * (1 - alpha)
        mu = res.mean(-1, keepdim=True)
        var = res.var(-1, unbiased=False, keepdim=True)
        ln = (res - mu) / torch.sqrt(var + 1e-5)
        out[rows] = ln * tt(P["ln_scale"][t]) + tt(P["ln_bias"][t])
    return out.reshape(T, C, Dout).numpy()


@pytest.mark.parametrize("edge_impl", ["segment", "sorted"])
def test_full_layer_matches_torch(edge_impl):
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(schema=schema, pad=PadSpec(node_cap=16, default_edge_cap=32))
    em = EdgeStaticMeta.from_layout(layout)
    rng = np.random.default_rng(0)
    batch = synth_batch(layout, rng, din=16, node_fill=0.75, edge_fill=0.6)
    T, C = layout.num_types, layout.node_cap
    H, D = 4, 16

    conv = HGTConv(
        in_dim=D, out_dim=D, num_types=T,
        num_relations=schema.num_relations, n_heads=H,
        dropout=0.0, use_norm=True, use_rte=True, edge_impl=edge_impl,
    )
    args = (
        jnp.asarray(batch.node_feat), jnp.asarray(batch.edge_src),
        jnp.asarray(batch.edge_tgt), jnp.asarray(batch.edge_dt),
        jnp.asarray(batch.edge_mask), jnp.asarray(batch.node_mask), em,
    )
    se = None
    if edge_impl == "sorted":
        from pyhgt_tpu.sampling.sorted_batch import sort_batch

        se = sort_batch(batch, layout, em)
    variables = conv.init(jax.random.key(0), *args, se=se)
    ours = np.asarray(conv.apply(variables, *args, se=se))

    P = {k: np.asarray(v) for k, v in variables["params"].items()}
    gold = torch_hgt_layer(
        batch.node_feat, np.asarray(batch.edge_src),
        np.asarray(batch.edge_tgt), np.asarray(batch.edge_dt),
        np.asarray(batch.edge_mask), em, P, H, T, C,
    )
    gold = gold * np.asarray(batch.node_mask)[..., None]
    np.testing.assert_allclose(ours, gold, rtol=5e-3, atol=5e-4)
