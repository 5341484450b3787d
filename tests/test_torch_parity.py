"""Golden parity vs an independent PyTorch implementation — forward AND
gradients, single layer AND composite model.

BASELINE.json asks for per-layer activation parity (allclose) with the
torch reference. PyG/torch-scatter are not installed here, so these tests
implement the reference equations (``/root/reference/pyHGT/conv.py:60-280``,
``model.py:3-14,54-80``) directly in plain torch (no PyG), as a
DIFFERENTIABLE float64 program: the same weights drive our flax layers and
torch autograd, and we assert

- HGTConv forward activations agree (message half: RTE, per-relation
  attention, segment softmax, aggregation; update half: gelu → per-type A
  linear → sigmoid skip gate → per-type LayerNorm),
- gradients of EVERY HGTConv parameter + the input agree with torch
  autograd,
- a 2-layer GNN + Classifier composite forward + KL-div loss and its
  gradients agree,
- DenseHGTConv (``conv.py:250-280``: plain residual + shared 2x-wide FFN
  + always-on final LayerNorm) agrees forward and backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.models import GNN, Classifier, DenseHGTConv, HGTConv
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.utils.synth import synth_batch


def torch_params(P):
    """float64 torch leaves (requires_grad) from a flax param dict."""
    out = {}
    for k, v in P.items():
        if isinstance(v, dict):
            out[k] = torch_params(v)
        else:
            out[k] = torch.tensor(
                np.asarray(v), dtype=torch.float64, requires_grad=True
            )
    return out


def torch_hgt_message(x_t, es, et, dt, mask, em, tp, H, use_rte=True):
    """Reference message half (``conv.py:60-111``) in differentiable torch:
    per-edge RTE add, per-relation K/V transforms, prior-scaled attention,
    segment softmax by target, weighted aggregation. ``x_t`` is
    ``[T, C, Din]`` float64. Returns ``aggr [N, Dout]``."""
    T, C, Din = x_t.shape
    N = T * C
    E = len(es)
    Dout = tp["wq"].shape[-1]
    dk = Dout // H
    xf = x_t.reshape(N, Din)
    if use_rte:
        sin = torch.tensor(rte_sin_table(Din), dtype=torch.float64)
        rte = sin @ tp["rte_w"] + tp["rte_b"]

    att_rows, msg_rows = [], []
    neg = torch.full((H,), -1e30, dtype=torch.float64)
    zmsg = torch.zeros((H, dk), dtype=torch.float64)
    for e in range(E):
        if not mask[e]:
            att_rows.append(neg)
            msg_rows.append(zmsg)
            continue
        st = em.block_src[em.edge_block[e]]
        tgt_t = em.block_tgt[em.edge_block[e]]
        r = em.edge_rel[e]
        xs = xf[es[e]]
        if use_rte:
            xs = xs + rte[dt[e]]                        # conv.py:91-92
        q = (xf[et[e]] @ tp["wq"][tgt_t] + tp["bq"][tgt_t]).view(H, dk)
        k = (xs @ tp["wk"][st] + tp["bk"][st]).view(H, dk)
        v = (xs @ tp["wv"][st] + tp["bv"][st]).view(H, dk)
        a_h, m_h = [], []
        for h in range(H):
            kr = k[h] @ tp["rel_att"][r, h]             # conv.py:97-98
            a_h.append(
                (q[h] * kr).sum() * tp["rel_pri"][r, h] / np.sqrt(dk)
            )
            m_h.append(v[h] @ tp["rel_msg"][r, h])      # conv.py:103-104
        att_rows.append(torch.stack(a_h))
        msg_rows.append(torch.stack(m_h))
    att = torch.stack(att_rows)                          # [E, H]
    msg = torch.stack(msg_rows)                          # [E, H, dk]

    # segment softmax by target (conv.py:108) + scatter-add aggregation
    w_rows = [torch.zeros(H, dtype=torch.float64)] * E
    aggr_rows = []
    for n in range(N):
        idx = [e for e in range(E) if et[e] == n and mask[e]]
        if not idx:
            aggr_rows.append(torch.zeros(Dout, dtype=torch.float64))
            continue
        soft = torch.softmax(att[idx], dim=0)            # [len(idx), H]
        for pos, e in enumerate(idx):
            w_rows[e] = soft[pos]
        aggr_rows.append(
            (soft.unsqueeze(-1) * msg[idx]).sum(0).reshape(Dout)
        )
    return torch.stack(aggr_rows)                        # [N, Dout]


def torch_hgt_update(aggr, x_t, tp, use_norm=True):
    """HGTConv update half (``conv.py:114-134``), dropout off: exact-erf
    gelu → per-type A linear → sigmoid skip gate → per-type LayerNorm."""
    T, C, Din = x_t.shape
    Dout = aggr.shape[-1]
    out_rows = []
    for t in range(T):
        rows = slice(t * C, (t + 1) * C)
        trans = (
            torch.nn.functional.gelu(aggr[rows]) @ tp["wa"][t] + tp["ba"][t]
        )
        alpha = torch.sigmoid(tp["skip"][t])
        res = trans * alpha + x_t[t] * (1 - alpha)
        if use_norm:
            mu = res.mean(-1, keepdim=True)
            var = res.var(-1, unbiased=False, keepdim=True)
            ln = (res - mu) / torch.sqrt(var + 1e-5)
            res = ln * tp["ln_scale"][t] + tp["ln_bias"][t]
        out_rows.append(res)
    return torch.stack(out_rows)                         # [T, C, Dout]


def torch_hgt_layer_t(x_t, es, et, dt, mask, em, tp, H,
                      use_rte=True, use_norm=True, node_mask=None):
    """Full differentiable HGTConv layer in torch (reference equations)."""
    T, C, _ = x_t.shape
    aggr = torch_hgt_message(x_t, es, et, dt, mask, em, tp, H, use_rte)
    out = torch_hgt_update(aggr, x_t, tp, use_norm=use_norm)
    if node_mask is not None:
        out = out * torch.tensor(
            np.asarray(node_mask, np.float64)
        ).unsqueeze(-1)
    return out


def torch_dense_hgt_layer_t(x_t, es, et, dt, mask, em, tp, H,
                            use_rte=True, use_norm=True, node_mask=None):
    """DenseHGTConv (``conv.py:250-280``): same message half, then plain
    per-type A linear + residual, gated per-type norm, shared 2x-wide FFN
    (exact gelu) and an always-on final shared LayerNorm (flax eps 1e-6)."""
    T, C, _ = x_t.shape
    Dout = tp["wa"].shape[-1]
    aggr = torch_hgt_message(x_t, es, et, dt, mask, em, tp, H, use_rte)
    res_rows = []
    for t in range(T):
        rows = slice(t * C, (t + 1) * C)
        trans = aggr[rows] @ tp["wa"][t] + tp["ba"][t]
        res = trans + x_t[t]
        if use_norm:
            mu = res.mean(-1, keepdim=True)
            var = res.var(-1, unbiased=False, keepdim=True)
            res = (res - mu) / torch.sqrt(var + 1e-5)
            res = res * tp["ln_scale"][t] + tp["ln_bias"][t]
        res_rows.append(res)
    res = torch.stack(res_rows)                          # [T, C, Dout]
    mid = res @ tp["mid"]["kernel"] + tp["mid"]["bias"]
    ffn = torch.nn.functional.gelu(mid) @ tp["out"]["kernel"] + tp["out"]["bias"]
    y = ffn + res
    mu = y.mean(-1, keepdim=True)
    var = y.var(-1, unbiased=False, keepdim=True)
    y = (y - mu) / torch.sqrt(var + 1e-6)                # flax LN eps
    y = y * tp["ffn_ln"]["scale"] + tp["ffn_ln"]["bias"]
    if node_mask is not None:
        y = y * torch.tensor(
            np.asarray(node_mask, np.float64)
        ).unsqueeze(-1)
    return y


def torch_hgt_layer(x, es, et, dt, mask, em, P, H, T, C, use_rte=True):
    """Non-differentiable wrapper kept for the forward test."""
    tp = torch_params(P)
    x_t = torch.tensor(np.asarray(x), dtype=torch.float64)
    with torch.no_grad():
        out = torch_hgt_layer_t(x_t, es, et, dt, mask, em, tp, H,
                                use_rte=use_rte)
    return out.numpy()


def _env():
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(
        schema=schema, pad=PadSpec(node_cap=16, default_edge_cap=32)
    )
    em = EdgeStaticMeta.from_layout(layout)
    rng = np.random.default_rng(0)
    batch = synth_batch(layout, rng, din=16, node_fill=0.75, edge_fill=0.6)
    return schema, layout, em, batch


@pytest.mark.parametrize("edge_impl", ["segment", "sorted"])
def test_full_layer_matches_torch(edge_impl):
    schema, layout, em, batch = _env()
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


def _assert_grads_close(g_jax, g_torch, rtol=5e-3, atol_frac=5e-4, name=""):
    a = np.asarray(g_jax, np.float64)
    b = g_torch.detach().numpy() if hasattr(g_torch, "detach") else np.asarray(
        g_torch)
    scale = max(float(np.max(np.abs(b))), 1e-9)
    np.testing.assert_allclose(
        a, b, rtol=rtol, atol=atol_frac * scale, err_msg=name
    )


@pytest.mark.parametrize("edge_impl", ["segment", "sorted"])
def test_hgtconv_grads_match_torch_autograd(edge_impl):
    """VERDICT r2 #3a: gradients of every HGTConv parameter AND the input
    vs torch autograd through the reference equations (float64)."""
    schema, layout, em, batch = _env()
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
    P = variables["params"]
    rng = np.random.default_rng(3)
    tgt = rng.normal(size=(T, C, D)).astype(np.float32)

    def loss_jax(params, x):
        out = conv.apply({"params": params}, x, *args[1:], se=se)
        return jnp.sum(out * jnp.asarray(tgt))

    g_params, g_x = jax.grad(loss_jax, argnums=(0, 1))(P, args[0])

    tp = torch_params({k: np.asarray(v) for k, v in P.items()})
    x_t = torch.tensor(
        np.asarray(batch.node_feat), dtype=torch.float64, requires_grad=True
    )
    out_t = torch_hgt_layer_t(
        x_t, np.asarray(batch.edge_src), np.asarray(batch.edge_tgt),
        np.asarray(batch.edge_dt), np.asarray(batch.edge_mask), em, tp, H,
        node_mask=batch.node_mask,
    )
    loss_t = (out_t * torch.tensor(tgt, dtype=torch.float64)).sum()
    loss_t.backward()

    _assert_grads_close(g_x, x_t.grad, name="x")
    for k in P:
        _assert_grads_close(g_params[k], tp[k].grad, name=k)


@pytest.mark.parametrize("edge_impl", ["segment", "sorted"])
def test_dense_hgtconv_matches_torch(edge_impl):
    """VERDICT r2 #3c: DenseHGTConv (``conv.py:250-280``) forward + grads
    vs the torch reference equations."""
    schema, layout, em, batch = _env()
    T, C = layout.num_types, layout.node_cap
    H, D = 4, 16
    conv = DenseHGTConv(
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
    P = variables["params"]
    rng = np.random.default_rng(4)
    tgt = rng.normal(size=(T, C, D)).astype(np.float32)

    def loss_jax(params, x):
        out = conv.apply({"params": params}, x, *args[1:], se=se)
        return jnp.sum(out * jnp.asarray(tgt)), out

    (_, ours), (g_params, g_x) = jax.value_and_grad(
        loss_jax, argnums=(0, 1), has_aux=True
    )(P, args[0])

    tp = torch_params(jax.tree.map(np.asarray, P))
    x_t = torch.tensor(
        np.asarray(batch.node_feat), dtype=torch.float64, requires_grad=True
    )
    out_t = torch_dense_hgt_layer_t(
        x_t, np.asarray(batch.edge_src), np.asarray(batch.edge_tgt),
        np.asarray(batch.edge_dt), np.asarray(batch.edge_mask), em, tp, H,
        node_mask=batch.node_mask,
    )
    np.testing.assert_allclose(
        np.asarray(ours), out_t.detach().numpy(), rtol=5e-3, atol=1e-3
    )
    loss_t = (out_t * torch.tensor(tgt, dtype=torch.float64)).sum()
    loss_t.backward()
    _assert_grads_close(g_x, x_t.grad, rtol=8e-3, atol_frac=1e-3, name="x")

    def walk(gj, gt, prefix=""):
        for k in gj:
            if isinstance(gj[k], dict):
                walk(gj[k], gt[k], prefix + k + "/")
            else:
                _assert_grads_close(
                    gj[k], gt[k].grad, rtol=8e-3, atol_frac=1e-3,
                    name=prefix + k,
                )

    walk(g_params, tp)


@pytest.mark.parametrize("edge_impl", ["segment", "sorted"])
def test_composite_gnn_classifier_kl_matches_torch(edge_impl):
    """VERDICT r2 #3b: a 2-layer GNN (per-type adapters + tanh + HGTConv
    stack, ``model.py:54-80``) + Classifier (``model.py:3-14``) + KL-div
    loss (``OAG/train_paper_field.py:87``): loss value AND gradients of
    every parameter vs torch autograd."""
    schema, layout, em, batch = _env()
    T, C = layout.num_types, layout.node_cap
    H, D = 4, 16
    n_seed, n_classes = 8, 5
    gnn = GNN(
        in_dim=D, n_hid=D, num_types=T,
        num_relations=schema.num_relations, n_heads=H, n_layers=2,
        dropout=0.0, conv_name="hgt", prev_norm=True, last_norm=True,
        use_rte=True, edge_impl=edge_impl,
    )
    clf = Classifier(n_out=n_classes)
    args = (
        jnp.asarray(batch.node_feat), jnp.asarray(batch.edge_src),
        jnp.asarray(batch.edge_tgt), jnp.asarray(batch.edge_dt),
        jnp.asarray(batch.edge_mask), jnp.asarray(batch.node_mask), em,
    )
    se = None
    if edge_impl == "sorted":
        from pyhgt_tpu.sampling.sorted_batch import sort_batch

        se = sort_batch(batch, layout, em)
    gvars = gnn.init(jax.random.key(0), *args, se=se)
    h0 = gnn.apply(gvars, *args, se=se)
    cvars = clf.init(jax.random.key(1), h0[0, :n_seed])

    rng = np.random.default_rng(6)
    soft = rng.random((n_seed, n_classes)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)  # reference normalizes to sum 1

    def loss_jax(gp, cp, x):
        h = gnn.apply({"params": gp}, x, *args[1:], se=se)
        logp = clf.apply({"params": cp}, h[0, :n_seed])
        t = jnp.asarray(soft)
        return jnp.mean(
            jnp.sum(t * (jnp.log(jnp.maximum(t, 1e-30)) - logp), axis=-1)
        )

    lj, (g_g, g_c, g_x) = jax.value_and_grad(loss_jax, argnums=(0, 1, 2))(
        gvars["params"], cvars["params"], args[0]
    )

    # ---- torch mirror ----
    GP = jax.tree.map(np.asarray, gvars["params"])
    tp_adapt = torch_params(
        {"adapt_w": GP["adapt_w"], "adapt_b": GP["adapt_b"]}
    )
    tps = [torch_params(GP[f"convs_{i}"]["base_conv"]) for i in range(2)]
    tp_clf = torch_params(
        {"kernel": np.asarray(cvars["params"]["Dense_0"]["kernel"]),
         "bias": np.asarray(cvars["params"]["Dense_0"]["bias"])}
    )
    x_t = torch.tensor(
        np.asarray(batch.node_feat), dtype=torch.float64, requires_grad=True
    )
    nm = torch.tensor(np.asarray(batch.node_mask, np.float64)).unsqueeze(-1)
    h = torch.tanh(
        torch.einsum("tcd,tde->tce", x_t, tp_adapt["adapt_w"])
        + tp_adapt["adapt_b"][:, None, :]
    ) * nm
    eargs = (
        np.asarray(batch.edge_src), np.asarray(batch.edge_tgt),
        np.asarray(batch.edge_dt), np.asarray(batch.edge_mask), em,
    )
    h = torch_hgt_layer_t(h, *eargs, tps[0], H, node_mask=batch.node_mask)
    h = torch_hgt_layer_t(h, *eargs, tps[1], H, node_mask=batch.node_mask)
    logits = h[0, :n_seed] @ tp_clf["kernel"] + tp_clf["bias"]
    logp_t = torch.log_softmax(logits, dim=-1)
    t = torch.tensor(soft, dtype=torch.float64)
    lt = (t * (torch.log(t.clamp_min(1e-30)) - logp_t)).sum(-1).mean()
    lt.backward()

    np.testing.assert_allclose(float(lj), float(lt), rtol=2e-3, atol=1e-5)
    _assert_grads_close(g_x, x_t.grad, rtol=8e-3, atol_frac=1e-3, name="x")
    _assert_grads_close(g_g["adapt_w"], tp_adapt["adapt_w"].grad,
                        rtol=8e-3, atol_frac=1e-3, name="adapt_w")
    _assert_grads_close(g_g["adapt_b"], tp_adapt["adapt_b"].grad,
                        rtol=8e-3, atol_frac=1e-3, name="adapt_b")
    for i in range(2):
        for k, v in g_g[f"convs_{i}"]["base_conv"].items():
            _assert_grads_close(
                v, tps[i][k].grad, rtol=8e-3, atol_frac=1e-3,
                name=f"convs_{i}/{k}",
            )
    _assert_grads_close(g_c["Dense_0"]["kernel"], tp_clf["kernel"].grad,
                        rtol=8e-3, atol_frac=1e-3, name="clf/kernel")
    _assert_grads_close(g_c["Dense_0"]["bias"], tp_clf["bias"].grad,
                        rtol=8e-3, atol_frac=1e-3, name="clf/bias")
