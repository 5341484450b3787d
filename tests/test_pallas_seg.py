"""Pallas segment-sum kernel (ops/pallas_seg): parity with numpy and with
the XLA tiled path, standalone and inside the sorted conv (value + grad).

Runs in interpret mode on the CPU mesh (conftest pins the cpu platform);
the real-chip numbers live in docs/PERF_NOTES.md (experiments/
pallas_probe5.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.pallas_seg import PK, live_partials
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.ops.sorted_hgt import hgt_conv_core_sorted, seg_sum_csr
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.sampling.sorted_batch import pallas_seg_aux, sort_batch
from pyhgt_tpu.utils.synth import synth_batch


def _ref_seg_sum(keys, data, num_segments):
    out = np.zeros((num_segments,) + data.shape[1:], np.float64)
    valid = keys < num_segments
    np.add.at(out, np.minimum(keys, num_segments - 1),
              np.where(valid.reshape(-1, *([1] * (data.ndim - 1))), data, 0))
    return out


@pytest.mark.parametrize("E,S,n_pad", [
    (PK, 40, 7),          # single tile
    (4 * PK, 300, 0),     # no padded edges
    (4 * PK, 300, 500),   # heavy padding tail
    (8 * PK, 17, 3),      # few segments: many tiles per segment
    (8 * PK, 8 * PK, 11),  # many segments: most rows live
])
def test_live_partials_matches_numpy(E, S, n_pad):
    rng = np.random.default_rng(E + S + n_pad)
    keys = np.sort(rng.integers(0, S, size=E - n_pad))
    keys = np.concatenate([keys, np.full(n_pad, S)]).astype(np.int64)
    aux = pallas_seg_aux(keys, S)
    data = rng.normal(size=(E, 256)).astype(np.float32)
    ref = _ref_seg_sum(keys, data, S)
    out = seg_sum_csr(live_partials(jnp.asarray(data), aux),
                      jnp.asarray(aux.ptr2))
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=1e-4, atol=1e-4 * scale)


def test_live_partials_bf16_input():
    rng = np.random.default_rng(0)
    E, S = 2 * PK, 100
    keys = np.sort(rng.integers(0, S, size=E)).astype(np.int64)
    aux = pallas_seg_aux(keys, S)
    data = rng.normal(size=(E, 128)).astype(np.float32)
    ref = _ref_seg_sum(keys, data, S)
    out = seg_sum_csr(
        live_partials(jnp.asarray(data, jnp.bfloat16), aux),
        jnp.asarray(aux.ptr2),
    )
    scale = np.max(np.abs(ref)) + 1e-6
    # values round to bf16 once; accumulation stays f32
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=2e-2, atol=1e-2 * scale)


def _ref_segment_softmax(keys, att, num_segments):
    """f64 per-segment softmax (exact max), masked rows (key==S) -> 0."""
    a = att.astype(np.float64)
    out = np.zeros_like(a)
    for s in range(num_segments):
        idx = np.flatnonzero(keys == s)
        if len(idx) == 0:
            continue
        z = a[idx]
        z = np.exp(z - z.max(axis=0, keepdims=True))
        out[idx] = z / z.sum(axis=0, keepdims=True)
    return out


@pytest.mark.parametrize("E,S,n_pad,hub", [
    (PK, 40, 7, False),        # single tile
    (4 * PK, 300, 500, False),  # heavy padding tail
    (8 * PK, 17, 3, True),     # hub segments spanning many tiles
])
def test_segment_softmax_partials_matches_reference(E, S, n_pad, hub):
    from pyhgt_tpu.ops.pallas_seg import segment_softmax_partials
    from pyhgt_tpu.ops.sorted_hgt import seg_max_csr

    rng = np.random.default_rng(E + S + n_pad)
    if hub:
        # one segment owns half the edges (spans > 2 tiles)
        keys = np.concatenate([
            np.zeros((E - n_pad) // 2, np.int64),
            np.sort(rng.integers(1, S, size=E - n_pad - (E - n_pad) // 2)),
        ])
    else:
        keys = np.sort(rng.integers(0, S, size=E - n_pad))
    keys = np.concatenate([keys, np.full(n_pad, S)]).astype(np.int64)
    aux = pallas_seg_aux(keys, S)
    att = (rng.normal(size=(E, 8)) * 4).astype(np.float32)
    att[keys == S] = -1e30                      # masked rows, as in ops
    ref = _ref_segment_softmax(keys, att, S)

    m_rows, s_rows = segment_softmax_partials(jnp.asarray(att), aux)
    assert np.isfinite(np.asarray(m_rows)).all()
    assert np.isfinite(np.asarray(s_rows)).all()
    key = jnp.asarray(aux.live_key)
    m_n = seg_max_csr(m_rows, key, jnp.asarray(aux.ptr2))
    scale = jnp.exp(jnp.minimum(m_rows - m_n[jnp.minimum(key, S - 1)], 0.0))
    den = seg_sum_csr(scale * s_rows, jnp.asarray(aux.ptr2))
    safe = np.minimum(keys, S - 1)
    ex = np.exp(
        np.minimum(np.asarray(att, np.float64)
                   - np.asarray(m_n, np.float64)[safe], 80.0)
    ) * (keys < S)[:, None]
    w = ex / np.maximum(np.asarray(den, np.float64)[safe], 1e-30)
    np.testing.assert_allclose(w, ref, rtol=2e-3, atol=2e-3)


def test_live_partials_pair_matches_singles():
    from pyhgt_tpu.ops.pallas_seg import live_partials_pair

    rng = np.random.default_rng(7)
    E, S = 4 * PK, 300
    keys = np.sort(rng.integers(0, S, size=E - 40))
    keys = np.concatenate([keys, np.full(40, S)]).astype(np.int64)
    aux = pallas_seg_aux(keys, S)
    d1 = rng.normal(size=(E, 256)).astype(np.float32)
    d2 = rng.normal(size=(E, 256)).astype(np.float32)
    p1, p2 = live_partials_pair(jnp.asarray(d1), jnp.asarray(d2), aux)
    r1 = live_partials(jnp.asarray(d1), aux)
    r2 = live_partials(jnp.asarray(d2), aux)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(r1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(r2),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError, match="pair shapes"):
        live_partials_pair(jnp.asarray(d1), jnp.asarray(d2[:, :128]), aux)


def test_tab_window_aux_matches_reference():
    """Per-(block, Δt) sums computed on block-contiguous (src-order) data
    via the window aux == plain np segment sums over tabidx."""
    from pyhgt_tpu.ops.pallas_seg import live_partials_pair
    from pyhgt_tpu.sampling.sorted_batch import pallas_tab_window_aux

    rng = np.random.default_rng(11)
    B, L = 3, 240
    sizes = [3 * PK + 100, 2 * PK - 100, 3 * PK]
    tab = np.concatenate([
        b * L + rng.integers(0, L, size=s) for b, s in enumerate(sizes)
    ]).astype(np.int64)
    E = tab.shape[0]
    aux = pallas_tab_window_aux(tab, B, L)
    assert aux is not None
    d1 = rng.normal(size=(E, 256)).astype(np.float32)
    d2 = rng.normal(size=(E, 256)).astype(np.float32)
    l1, l2 = live_partials_pair(jnp.asarray(d1), jnp.asarray(d2), aux)
    o1 = seg_sum_csr(l1, jnp.asarray(aux.ptr2))
    o2 = seg_sum_csr(l2, jnp.asarray(aux.ptr2))
    r1 = _ref_seg_sum(tab, d1, B * L)
    r2 = _ref_seg_sum(tab, d2, B * L)
    scale = np.max(np.abs(r1)) + 1e-6
    np.testing.assert_allclose(np.asarray(o1), r1, rtol=1e-4,
                               atol=1e-4 * scale)
    np.testing.assert_allclose(np.asarray(o2), r2, rtol=1e-4,
                               atol=1e-4 * scale)

    # fallbacks: interleaved blocks / tiny blocks -> None
    assert pallas_tab_window_aux(
        rng.integers(0, B * L, size=E).astype(np.int64), B, L) is None
    tiny = np.concatenate([
        b * L + rng.integers(0, L, size=PK // 4) for b in range(4)
    ] + [3 * L + rng.integers(0, L, size=7 * PK)]).astype(np.int64)
    assert pallas_tab_window_aux(tiny, 4, L) is None


def test_sorted_conv_tab_window_path():
    """Full conv parity on a layout whose blocks all exceed the kernel
    tile (node_cap/edge caps >= 512): the tab-window aux must build and
    the seg_pallas path (now permute-free for the RTE-table grads) must
    match the XLA path in values and grads."""
    from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
    from pyhgt_tpu.sampling.batch import BatchLayout
    from pyhgt_tpu.utils.synth import synth_batch

    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(
        schema=schema, pad=PadSpec(node_cap=512, default_edge_cap=1024)
    )
    em = EdgeStaticMeta.from_layout(layout)
    batch = synth_batch(layout, np.random.default_rng(9), din=16,
                        node_fill=0.9, edge_fill=0.9)
    se = sort_batch(batch, layout, em)
    assert se.ptab_src is not None, "window aux should build at these caps"

    T, C = layout.num_types, layout.node_cap
    H, Dout = 4, 256
    dk = Dout // H
    R = layout.schema.num_relations
    rng = np.random.default_rng(13)
    P = {
        "wq": rng.normal(size=(T, 16, Dout)).astype(np.float32) * 0.3,
        "bq": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wk": rng.normal(size=(T, 16, Dout)).astype(np.float32) * 0.3,
        "bk": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wv": rng.normal(size=(T, 16, Dout)).astype(np.float32) * 0.3,
        "bv": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "rel_pri": (rng.normal(size=(R, H)) + 1).astype(np.float32),
        "rel_att": rng.normal(size=(R, H, dk, dk)).astype(np.float32) * 0.3,
        "rel_msg": rng.normal(size=(R, H, dk, dk)).astype(np.float32) * 0.3,
    }
    P = {k: jnp.asarray(v) for k, v in P.items()}
    rte_vec = jnp.asarray(rte_sin_table(16))
    x = jnp.asarray(batch.node_feat)
    tgt = jnp.asarray(rng.normal(size=(T, C, Dout)).astype(np.float32))

    def loss(params, x, seg_pallas):
        out = hgt_conv_core_sorted(
            x, se, em, n_heads=H, rte_vec=rte_vec,
            seg_pallas=seg_pallas, **params,
        )
        return jnp.sum(out * tgt), out

    import pyhgt_tpu.ops.sorted_hgt as sh

    (_, p0), gp0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        P, x, False)
    for weighted in (False, True):   # fused weighted kernel: both routings
        old = sh.WEIGHTED_KERNEL
        sh.WEIGHTED_KERNEL = weighted
        try:
            (_, p1), gp1 = jax.value_and_grad(
                loss, argnums=(0, 1), has_aux=True)(P, x, True)
        finally:
            sh.WEIGHTED_KERNEL = old
        scale = float(np.max(np.abs(np.asarray(p0)))) + 1e-6
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-4, atol=1e-4 * scale,
                                   err_msg=f"weighted={weighted}")
        for name, a, b in [("x", gp1[1], gp0[1])] + [
            (k, gp1[0][k], gp0[0][k]) for k in P
        ]:
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            s = np.max(np.abs(b)) + 1e-6
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-4 * s,
                err_msg=f"{name} weighted={weighted}")


def test_head_sum_product_matches_xla():
    from pyhgt_tpu.ops.pallas_seg import head_sum_product

    rng = np.random.default_rng(21)
    E, D, dk = 4 * PK, 256, 32
    a = rng.normal(size=(E, D)).astype(np.float32)
    b = rng.normal(size=(E, D)).astype(np.float32)
    ref = (a.astype(np.float64) * b).reshape(E, D // dk, dk).sum(-1)
    out = head_sum_product(jnp.asarray(a), jnp.asarray(b), dk)
    assert out.shape == (E, D // dk)
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=1e-4, atol=1e-4 * scale)
    # bf16 inputs (the production edge dtype)
    out_bf = head_sum_product(
        jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16), dk
    )
    np.testing.assert_allclose(np.asarray(out_bf), ref,
                               rtol=3e-2, atol=2e-2 * scale)
    with pytest.raises(ValueError, match="shapes differ"):
        head_sum_product(jnp.asarray(a), jnp.asarray(b[:, :128]), dk)
    with pytest.raises(ValueError, match="multiple"):
        head_sum_product(jnp.asarray(a[: PK + 1]), jnp.asarray(b[: PK + 1]),
                         dk)


def test_live_partials_weighted_matches_unfused():
    from pyhgt_tpu.ops.pallas_seg import live_partials_weighted

    rng = np.random.default_rng(23)
    E, S, D, dk = 4 * PK, 300, 256, 64
    H = D // dk
    keys = np.sort(rng.integers(0, S, size=E - 40))
    keys = np.concatenate([keys, np.full(40, S)]).astype(np.int64)
    aux = pallas_seg_aux(keys, S)
    w = rng.random(size=(E, H)).astype(np.float32)
    v = rng.normal(size=(E, D)).astype(np.float32)
    msg = np.repeat(w, dk, axis=1) * v
    ref = _ref_seg_sum(keys, msg, S)
    out = seg_sum_csr(
        live_partials_weighted(jnp.asarray(w), jnp.asarray(v), dk, aux),
        jnp.asarray(aux.ptr2),
    )
    scale = np.max(np.abs(ref)) + 1e-6
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=1e-4, atol=1e-4 * scale)
    # bf16 values: single-pass matmul, bf16-class accuracy
    out_bf = seg_sum_csr(
        live_partials_weighted(
            jnp.asarray(w), jnp.asarray(v, jnp.bfloat16), dk, aux
        ),
        jnp.asarray(aux.ptr2),
    )
    np.testing.assert_allclose(np.asarray(out_bf), ref,
                               rtol=2e-2, atol=1e-2 * scale)
    with pytest.raises(ValueError, match="!="):
        live_partials_weighted(jnp.asarray(w[:, :2]), jnp.asarray(v), dk, aux)


def test_live_partials_rejects_bad_shape():
    aux = pallas_seg_aux(np.zeros(PK, np.int64), 4)
    with pytest.raises(ValueError, match="aux tiles"):
        live_partials(jnp.zeros((PK + 1, 128)), aux)


@pytest.fixture(scope="module")
def env():
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(
        schema=schema, pad=PadSpec(node_cap=32, default_edge_cap=64)
    )
    em = EdgeStaticMeta.from_layout(layout)
    batch = synth_batch(layout, np.random.default_rng(5), din=24,
                        node_fill=0.8, edge_fill=0.7)
    se = sort_batch(batch, layout, em)
    return layout, em, batch, se


def test_sorted_conv_seg_pallas_matches_xla(env):
    """seg_pallas=True == seg_pallas=False through the full custom-VJP
    conv: values and every gradient (the kernel covers fwd aggregation and
    all five backward wide reductions)."""
    layout, em, batch, se = env
    T, C = layout.num_types, layout.node_cap
    Din = Dout = 24
    # Dout=24 < 128 stays on the XLA path; widen the head dim via H=1 to
    # exercise the kernel guard both ways
    H = 4
    R = layout.schema.num_relations
    rng = np.random.default_rng(3)
    P = {
        "wq": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bq": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wk": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bk": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "wv": rng.normal(size=(T, Din, Dout)).astype(np.float32) * 0.3,
        "bv": rng.normal(size=(T, Dout)).astype(np.float32) * 0.1,
        "rel_pri": (rng.normal(size=(R, H)) + 1).astype(np.float32),
        "rel_att": rng.normal(size=(R, H, 6, 6)).astype(np.float32) * 0.3,
        "rel_msg": rng.normal(size=(R, H, 6, 6)).astype(np.float32) * 0.3,
    }
    P = {k: jnp.asarray(v) for k, v in P.items()}
    rte_vec = jnp.asarray(rte_sin_table(Din))
    x = jnp.asarray(batch.node_feat)
    tgt = jnp.asarray(rng.normal(size=(T, C, Dout)).astype(np.float32))

    def loss(params, x, seg_pallas):
        out = hgt_conv_core_sorted(
            x, se, em, n_heads=H, rte_vec=rte_vec,
            seg_pallas=seg_pallas, **params,
        )
        return jnp.sum(out * tgt), out

    (_, o0), g0 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        P, x, False)
    (_, o1), g1 = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
        P, x, True)

    # Dout=24 < 128: the width guard keeps everything on XLA
    scale0 = float(np.max(np.abs(np.asarray(o0)))) + 1e-6
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                               rtol=1e-6, atol=1e-6 * scale0)

    # widen to Dout=192 so the kernel actually runs
    Dout2 = 192
    dk2 = Dout2 // H
    P2 = {
        "wq": rng.normal(size=(T, Din, Dout2)).astype(np.float32) * 0.3,
        "bq": rng.normal(size=(T, Dout2)).astype(np.float32) * 0.1,
        "wk": rng.normal(size=(T, Din, Dout2)).astype(np.float32) * 0.3,
        "bk": rng.normal(size=(T, Dout2)).astype(np.float32) * 0.1,
        "wv": rng.normal(size=(T, Din, Dout2)).astype(np.float32) * 0.3,
        "bv": rng.normal(size=(T, Dout2)).astype(np.float32) * 0.1,
        "rel_pri": (rng.normal(size=(R, H)) + 1).astype(np.float32),
        "rel_att": rng.normal(size=(R, H, dk2, dk2)).astype(np.float32) * 0.3,
        "rel_msg": rng.normal(size=(R, H, dk2, dk2)).astype(np.float32) * 0.3,
    }
    P2 = {k: jnp.asarray(v) for k, v in P2.items()}
    tgt2 = jnp.asarray(rng.normal(size=(T, C, Dout2)).astype(np.float32))

    def loss2(params, x, seg_pallas, softmax_pallas=False):
        out = hgt_conv_core_sorted(
            x, se, em, n_heads=H, rte_vec=rte_vec,
            seg_pallas=seg_pallas, softmax_pallas=softmax_pallas, **params,
        )
        return jnp.sum(out * tgt2), out

    (_, p0), gp0 = jax.value_and_grad(loss2, argnums=(0, 1), has_aux=True)(
        P2, x, False)
    for softmax_pallas in (False, True):
        (_, p1), gp1 = jax.value_and_grad(
            loss2, argnums=(0, 1), has_aux=True
        )(P2, x, True, softmax_pallas)
        scale = float(np.max(np.abs(np.asarray(p0)))) + 1e-6
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   rtol=1e-4, atol=1e-4 * scale)
        for name, a, b in [("x", gp1[1], gp0[1])] + [
            (k, gp1[0][k], gp0[0][k]) for k in P2
        ]:
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            s = np.max(np.abs(b)) + 1e-6
            np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-4 * s,
                err_msg=f"{name} softmax_pallas={softmax_pallas}",
            )
