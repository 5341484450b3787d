"""Edge-partitioned (graph-axis) HGT == single-device results, values and
gradients — SURVEY.md §7 stage 8 correctness on the virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.rte import rte_sin_table
from pyhgt_tpu.ops.sorted_hgt import hgt_conv_core_sorted
from pyhgt_tpu.parallel.edge_partition import (
    hgt_conv_core_partitioned,
    partition_sorted,
)
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.sampling.sorted_batch import sort_batch
from pyhgt_tpu.utils.synth import synth_batch
from tests.test_sorted_ops import _params


@pytest.fixture(scope="module")
def env():
    """2-shard partition: every boundary-exchange path crosses shards
    already at P=2, and the shard_map compile (the suite's old 13-min
    pole) is ~3x cheaper than at P=4. A 4-shard point is kept in
    test_partitioned_matches_single via ``env4``; P=8 rings are covered
    raw in test_ring_allreduce_primitive."""
    return _make_env(n_parts=2)


@pytest.fixture(scope="module")
def env4():
    return _make_env(n_parts=4)


def _make_env(n_parts: int):
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(schema=schema, pad=PadSpec(node_cap=32, default_edge_cap=64))
    em = EdgeStaticMeta.from_layout(layout)
    batch = synth_batch(layout, np.random.default_rng(3), din=24,
                        node_fill=0.8, edge_fill=0.7)
    # pk=256 (vs the 384 production default) keeps the interpret-mode
    # kernels ~2x cheaper on this tiny layout — the parity semantics are
    # identical (tile size is swept separately in test_sorted_ops)
    se = sort_batch(batch, layout, em, pk=256)
    pe = partition_sorted(
        se, n_parts, num_blocks=len(layout.blocks),
        node_cap=layout.node_cap,
        num_nodes_flat=layout.num_types * layout.node_cap,
        pk=256,
    )
    P_ = _params(np.random.default_rng(0), 2, schema.num_relations, 24, 24, 4)
    mesh = Mesh(np.asarray(jax.devices()[:n_parts]), ("graph",))
    return layout, em, batch, se, pe, P_, mesh


def _partitioned_fn(layout, em, mesh, use_rte, overlap=False):
    rte_vec = jnp.asarray(rte_sin_table(24)) if use_rte else None

    def inner(x, pe_local, params):
        pe1 = jax.tree.map(lambda a: a[0], pe_local)  # drop the size-1 shard dim
        return hgt_conv_core_partitioned(
            x, pe1, em, n_heads=4, rte_vec=rte_vec, axis_name="graph",
            overlap=overlap, **params
        )

    return shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P("graph"), P()),
        out_specs=P(),
        check_vma=False,
    )


@pytest.mark.parametrize("use_rte", [True, False])
def test_partitioned_matches_single(env, env4, use_rte):
    # use_rte=True runs the 4-shard partition (the one multi-hop coverage
    # point); the rest of the file runs at 2 shards (see env docstring)
    layout, em, batch, se, pe, P_, mesh = env4 if use_rte else env
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24)) if use_rte else None
    ref = hgt_conv_core_sorted(x, se, em, n_heads=4, rte_vec=rte_vec, **P_)
    f = _partitioned_fn(layout, em, mesh, use_rte)
    out = f(x, pe, P_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_partitioned_gradients_match(env):
    layout, em, batch, se, pe, P_, mesh = env
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24))
    T, C = layout.num_types, layout.node_cap
    tgt = jnp.asarray(
        np.random.default_rng(9).normal(size=(T, C, 24)).astype(np.float32)
    )

    def loss_ref(params, x):
        out = hgt_conv_core_sorted(x, se, em, n_heads=4, rte_vec=rte_vec, **params)
        return jnp.sum(out * tgt)

    f = _partitioned_fn(layout, em, mesh, True)

    def loss_part(params, x):
        return jnp.sum(f(x, pe, params) * tgt)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(P_, x)
    g_part = jax.grad(loss_part, argnums=(0, 1))(P_, x)
    np.testing.assert_allclose(
        np.asarray(g_part[1]), np.asarray(g_ref[1]), rtol=5e-3, atol=5e-4
    )
    for k in P_:
        np.testing.assert_allclose(
            np.asarray(g_part[0][k]), np.asarray(g_ref[0][k]),
            rtol=5e-3, atol=5e-4, err_msg=k,
        )


def test_partitioned_gnn_model_matches(env):
    """Whole-GNN forward under shard_map(graph axis) == sorted-path GNN."""
    import flax.linen as fnn
    from pyhgt_tpu.models import GNN
    from pyhgt_tpu.utils.synth import synth_batch

    layout, em, batch, se, pe, P_, mesh = env
    kw = dict(
        in_dim=24, n_hid=24, num_types=layout.num_types,
        num_relations=layout.schema.num_relations, n_heads=4, n_layers=2,
        dropout=0.0, prev_norm=True, last_norm=True,
    )
    gnn_sorted = GNN(**kw, edge_impl="sorted")
    gnn_part = GNN(**kw, graph_axis="graph")

    x = jnp.asarray(batch.node_feat)
    nmask = jnp.asarray(batch.node_mask)
    dummy = jnp.zeros_like(se.edge_tgt)
    params = gnn_sorted.init(
        jax.random.key(0), x, dummy, dummy, dummy,
        jnp.asarray(se.edge_mask), nmask, em, se=se,
    )
    ref = gnn_sorted.apply(
        params, x, dummy, dummy, dummy, jnp.asarray(se.edge_mask),
        nmask, em, se=se,
    )

    def inner(p, x_, pe_local):
        pe1 = jax.tree.map(lambda a: a[0], pe_local)
        d = jnp.zeros((1,), jnp.int32)  # unused edge args under pe path
        return gnn_part.apply(
            p, x_, d, d, d, jnp.zeros((1,), bool), nmask, em, pe=pe1
        )

    f = shard_map(
        inner, mesh=mesh, in_specs=(P(), P(), P("graph")), out_specs=P(),
        check_vma=False,
    )
    out = f(params, x, pe)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_gp_overlap_ring_matches_psum(env):
    """gp_overlap: the manual chunked-ppermute ring allreduce (the
    ICI-pipelinable boundary exchange, VERDICT r2 #6) produces the same
    values AND gradients as the XLA psum/pmax path."""
    layout, em, batch, se, pe, P_, mesh = env
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24))
    T, C = layout.num_types, layout.node_cap
    tgt = jnp.asarray(
        np.random.default_rng(11).normal(size=(T, C, 24)).astype(np.float32)
    )
    f0 = _partitioned_fn(layout, em, mesh, True, overlap=False)
    f1 = _partitioned_fn(layout, em, mesh, True, overlap=True)
    np.testing.assert_allclose(
        np.asarray(f1(x, pe, P_)), np.asarray(f0(x, pe, P_)),
        rtol=1e-5, atol=1e-6,
    )

    def loss(params, x, f):
        return jnp.sum(f(x, pe, params) * tgt)

    g0 = jax.grad(loss, argnums=(0, 1))(P_, x, f0)
    g1 = jax.grad(loss, argnums=(0, 1))(P_, x, f1)
    np.testing.assert_allclose(
        np.asarray(g1[1]), np.asarray(g0[1]), rtol=1e-4, atol=1e-6
    )
    for k in P_:
        np.testing.assert_allclose(
            np.asarray(g1[0][k]), np.asarray(g0[0][k]),
            rtol=1e-4, atol=1e-6, err_msg=k,
        )


def test_ring_allreduce_primitive():
    """_ring_allreduce == psum/pmax on raw arrays for P in {2, 4, 8},
    including row counts not divisible by P."""
    from jax import shard_map as _sm
    from pyhgt_tpu.parallel.edge_partition import _ring_allreduce

    for Pn, rows in ((2, (7, 5)), (8, (25,))):
        mesh = Mesh(np.asarray(jax.devices()[:Pn]), ("graph",))
        for n_rows in rows:
            x = np.random.default_rng(Pn * 100 + n_rows).normal(
                size=(Pn, n_rows, 4)
            ).astype(np.float32)

            def ring_sum(xs):
                return _ring_allreduce(xs[0], "graph", "sum")

            def ring_max(xs):
                return _ring_allreduce(xs[0], "graph", "max")

            got_s = _sm(ring_sum, mesh=mesh, in_specs=(P("graph"),),
                        out_specs=P("graph"), check_vma=False)(x)
            got_m = _sm(ring_max, mesh=mesh, in_specs=(P("graph"),),
                        out_specs=P("graph"), check_vma=False)(x)
            want_s = x.sum(0)
            want_m = x.max(0)
            for p_ in range(Pn):
                np.testing.assert_allclose(
                    got_s[p_ * n_rows:(p_ + 1) * n_rows]
                    if got_s.shape[0] == Pn * n_rows else got_s,
                    want_s, rtol=1e-5, atol=1e-6)
                break  # out_specs P("graph") concatenates; check shard 0
            np.testing.assert_allclose(
                got_m[:n_rows], want_m, rtol=1e-5, atol=1e-6)


def test_partitioned_production_knobs_match(env):
    """The per-shard production knobs (save_kv + Pallas segment kernels)
    produce the same values/grads through the partitioned path — each gp
    shard runs the full single-chip machinery (round-3 rebuild)."""
    layout, em, batch, se, pe, _P, mesh = env
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24))
    T, C = layout.num_types, layout.node_cap
    # Dout = 128 so the per-shard Pallas segment kernels actually engage
    # (the narrow-width fallback would make seg_pallas a no-op at D=24)
    P_ = _params(np.random.default_rng(13), T,
                 layout.schema.num_relations, 24, 128, 4)
    tgt = jnp.asarray(
        np.random.default_rng(13).normal(size=(T, C, 128)).astype(np.float32)
    )

    def part_fn(save_kv, seg_pallas):
        def inner(x, pe_local, params):
            pe1 = jax.tree.map(lambda a: a[0], pe_local)
            return hgt_conv_core_partitioned(
                x, pe1, em, n_heads=4, rte_vec=rte_vec, axis_name="graph",
                save_kv=save_kv, seg_pallas=seg_pallas, **params,
            )

        return shard_map(
            inner, mesh=mesh, in_specs=(P(), P("graph"), P()),
            out_specs=P(), check_vma=False,
        )

    def loss(params, x, f):
        return jnp.sum(f(x, pe, params) * tgt)

    f0 = part_fn(False, False)
    f1 = part_fn(True, True)
    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(P_, x, f0)
    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(P_, x, f1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(g1[1]), np.asarray(g0[1]), rtol=2e-3, atol=2e-4
    )
    for k in P_:
        np.testing.assert_allclose(
            np.asarray(g1[0][k]), np.asarray(g0[0][k]),
            rtol=2e-3, atol=2e-4, err_msg=k,
        )


def test_partition_refuses_compacted_batch():
    """gp shards rebuild aux from se.tabidx assuming the full B*L space;
    a tab-compacted batch must be refused loudly (Flagship.sort and the
    engine producer build uncompacted when gp > 1)."""
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch

    fl = build_flagship("tiny", tab_cap=64)
    batch, _ = synth_flagship_batch(fl, seed=0)
    se = fl.sort(batch)
    assert se.tab_sel is not None
    with pytest.raises(ValueError, match="UNCOMPACTED"):
        partition_sorted(
            se, 2, num_blocks=len(fl.layout.blocks),
            node_cap=fl.layout.node_cap,
            num_nodes_flat=fl.layout.num_types * fl.layout.node_cap,
        )
    # the gp-aware sort builds uncompacted (partitionable) batches
    fl_gp = build_flagship("tiny", tab_cap=64, graph_axis="graph")
    se_gp = fl_gp.sort(batch)
    assert se_gp.tab_sel is None and se_gp.src_cut == 0
    partition_sorted(
        se_gp, 2, num_blocks=len(fl_gp.layout.blocks),
        node_cap=fl_gp.layout.node_cap,
        num_nodes_flat=fl_gp.layout.num_types * fl_gp.layout.node_cap,
    )


def test_partitioned_production_caps_match_single(env):
    """Round-5 (VERDICT r4 weak #3): the per-shard production preset —
    tab compaction + tgt rank cap built INSIDE partition_sorted, plus the
    cross-shard tilemax softmax — matches the single-chip uncapped
    reference for values and gradients. The caps are exact rewrites, so
    the capped multi-chip program must equal the uncapped program."""
    layout, em, batch, se, _pe, P_, mesh = env
    pe = partition_sorted(
        se, 2, num_blocks=len(layout.blocks),
        node_cap=layout.node_cap,
        num_nodes_flat=layout.num_types * layout.node_cap,
        pk=256, tgt_rank_cap=72, tab_cap=64,
    )
    # the caps actually engaged (not silently fallen back)
    assert pe.se.tab_sel is not None and pe.se.tab_sel.shape[0] == 2
    assert getattr(pe.se.pseg_tgt, "v", 0) == 72
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24))
    ref = hgt_conv_core_sorted(x, se, em, n_heads=4, rte_vec=rte_vec, **P_)

    def inner(x_, pe_local, params):
        pe1 = jax.tree.map(lambda a: a[0], pe_local)
        return hgt_conv_core_partitioned(
            x_, pe1, em, n_heads=4, rte_vec=rte_vec, axis_name="graph",
            softmax_tilemax=True, **params
        )

    f = shard_map(
        inner, mesh=mesh, in_specs=(P(), P("graph"), P()), out_specs=P(),
        check_vma=False,
    )
    out = f(x, pe, P_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    T, C = layout.num_types, layout.node_cap
    tgt = jnp.asarray(
        np.random.default_rng(11).normal(size=(T, C, 24)).astype(np.float32)
    )

    def loss_ref(params, x_):
        o = hgt_conv_core_sorted(x_, se, em, n_heads=4, rte_vec=rte_vec,
                                 **params)
        return jnp.sum(o * tgt)

    def loss_part(params, x_):
        return jnp.sum(f(x_, pe, params) * tgt)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(P_, x)
    g_part = jax.grad(loss_part, argnums=(0, 1))(P_, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_part)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-4, atol=3e-4)


def test_partition_cap_fallback_is_all_or_none(env):
    """A cap no shard can satisfy falls back for EVERY shard (the stack
    stays homogeneous and runs one program) instead of erroring or mixing
    compacted and uncompacted shards."""
    layout, em, batch, se, _pe, P_, mesh = env
    pe = partition_sorted(
        se, 2, num_blocks=len(layout.blocks),
        node_cap=layout.node_cap,
        num_nodes_flat=layout.num_types * layout.node_cap,
        pk=256, tgt_rank_cap=8, tab_cap=64,  # rank cap 8 is unsatisfiable
    )
    assert getattr(pe.se.pseg_tgt, "v", 0) == 0  # legacy width everywhere
    # tab compaction is independent of the rank-cap fallback
    assert pe.se.tab_sel is not None


def test_partitioned_tilemax_auto_matches_single(env):
    """The runtime-guarded 'auto' tilemax under gp: the spread check is
    globally agreed (xreduce-or) so every shard takes the same lax.cond
    branch, and both branches' collectives match the scan softmax."""
    layout, em, batch, se, _pe, P_, mesh = env
    pe = partition_sorted(
        se, 2, num_blocks=len(layout.blocks),
        node_cap=layout.node_cap,
        num_nodes_flat=layout.num_types * layout.node_cap,
        pk=256,
    )
    x = jnp.asarray(batch.node_feat)
    rte_vec = jnp.asarray(rte_sin_table(24))
    ref = hgt_conv_core_sorted(x, se, em, n_heads=4, rte_vec=rte_vec, **P_)

    def inner(x_, pe_local, params):
        pe1 = jax.tree.map(lambda a: a[0], pe_local)
        return hgt_conv_core_partitioned(
            x_, pe1, em, n_heads=4, rte_vec=rte_vec, axis_name="graph",
            softmax_tilemax="auto", **params
        )

    f = shard_map(
        inner, mesh=mesh, in_specs=(P(), P("graph"), P()), out_specs=P(),
        check_vma=False,
    )
    out = f(x, pe, P_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
