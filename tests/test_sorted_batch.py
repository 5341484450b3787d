"""sort_batch invariants: permutation correctness, CSR pointers, one-hots."""

import numpy as np
import pytest

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.ops.rte import RTE_MAX_LEN
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.sampling.sorted_batch import sort_batch
from pyhgt_tpu.utils.synth import synth_batch


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
    layout = BatchLayout(schema=schema, pad=PadSpec(node_cap=32, default_edge_cap=64))
    em = EdgeStaticMeta.from_layout(layout)
    batch = synth_batch(layout, np.random.default_rng(0), din=8,
                        node_fill=0.8, edge_fill=0.7)
    return layout, em, batch, sort_batch(batch, layout, em)


def test_sorted_by_target(env):
    layout, em, batch, se = env
    valid = se.edge_mask
    t = se.edge_tgt[valid]
    assert (np.diff(t) >= 0).all()
    # padding sorts last
    assert valid[: valid.sum()].all()


def test_permutation_preserves_edges(env):
    layout, em, batch, se = env
    orig = set(
        zip(
            np.asarray(batch.edge_tgt)[np.asarray(batch.edge_mask)].tolist(),
            np.asarray(batch.edge_src)[np.asarray(batch.edge_mask)].tolist(),
            np.asarray(batch.edge_dt)[np.asarray(batch.edge_mask)].tolist(),
        )
    )
    new = set(
        zip(
            se.edge_tgt[se.edge_mask].tolist(),
            se.edge_src[se.edge_mask].tolist(),
            se.edge_dt[se.edge_mask].tolist(),
        )
    )
    assert orig == new


def test_seg_ptr_tgt_is_csr(env):
    layout, em, batch, se = env
    N = layout.num_types * layout.node_cap
    ptr = se.seg_ptr_tgt
    assert ptr.shape == (N + 1,)
    assert ptr[0] == 0 and ptr[-1] == se.edge_mask.sum()
    for n in [0, 1, 5, N - 1]:
        seg = se.edge_tgt[ptr[n] : ptr[n + 1]]
        if len(seg):
            assert (seg == n).all()
    # total coverage
    counts = np.diff(ptr)
    assert counts.sum() == se.edge_mask.sum()


def test_src_and_tab_permutations(env):
    layout, em, batch, se = env
    C, L = layout.node_cap, RTE_MAX_LEN
    g = se.gidx[se.perm_src]
    m = se.edge_mask[se.perm_src]
    # src order is sorted over ALL edges: masked edges carry their own
    # block's last (blk, C-1) segment id (layout-static block boundaries;
    # their data rows are zero so segment sums are unchanged)
    assert (np.diff(g) >= 0).all() or (
        np.diff(g.astype(np.int64)) >= 0
    ).all()
    BC = len(layout.blocks) * C
    assert se.seg_ptr_src.shape == (BC + 1,)
    assert se.seg_ptr_src[-1] == len(se.edge_mask)
    assert (se.gidx[~se.edge_mask] % C == C - 1).all()

    t = se.tabidx[se.perm_tab]
    assert (np.diff(t.astype(np.int64)) >= 0).all()
    BL = len(layout.blocks) * L
    assert se.seg_ptr_tab[-1] == len(se.edge_mask)
    assert se.seg_ptr_tab.shape == (BL + 1,)
    assert (se.tabidx[~se.edge_mask] % L == L - 1).all()

    # per-block src-order boundaries equal the static per-block edge caps
    # (the PK-rounding pad rows land in the last block, also statically)
    blk_of_src_order = se.gidx[se.perm_src] // C
    caps = np.asarray([b.cap for b in layout.blocks], dtype=np.int64)
    caps[-1] += len(se.edge_mask) - layout.num_edges
    counts = np.bincount(blk_of_src_order, minlength=len(layout.blocks))
    np.testing.assert_array_equal(counts, caps)


def test_rel_onehot(env):
    layout, em, batch, se = env
    R = layout.schema.num_relations
    assert se.rel_onehot.shape[1] == R
    rows = se.rel_onehot.sum(axis=1)
    np.testing.assert_array_equal(rows[se.edge_mask], 1.0)
    np.testing.assert_array_equal(rows[~se.edge_mask], 0.0)


def test_gidx_matches_static_offsets(env):
    layout, em, batch, se = env
    # recompute gidx from first principles for a few valid edges
    C = layout.node_cap
    blocks = layout.blocks
    # invert: for each sorted edge, find its block via rel_onehot + src/tgt types
    valid_idx = np.where(se.edge_mask)[0][:50]
    for i in valid_idx:
        b = se.gidx[i] // C
        src_local = se.gidx[i] % C
        blk = blocks[b]
        assert se.edge_src[i] == blk.src_type_id * C + src_local
