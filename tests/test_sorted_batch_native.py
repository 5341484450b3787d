"""C++ batch-prep core (native/sortbatch.cpp) == numpy reference, bit for
bit: counting sorts, tiled aux, Pallas aux, and the whole SortedEdges."""

import numpy as np
import pytest

from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation, PadSpec
from pyhgt_tpu.ops.hgt import EdgeStaticMeta
from pyhgt_tpu.sampling.batch import BatchLayout
from pyhgt_tpu.sampling.sorted_batch import (
    REDUCE_TILE,
    _tiled_aux,
    pallas_seg_aux,
    sort_batch,
)
from pyhgt_tpu.utils.synth import synth_batch

nb = pytest.importorskip("pyhgt_tpu.sampling.native_batch")
if not nb.native_available():
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.mark.parametrize("E,S,seed", [(256, 7, 0), (4096, 300, 1),
                                      (2048, 2048, 2)])
def test_counting_sort_matches_argsort(E, S, seed):
    rng = np.random.default_rng(seed)
    key = rng.integers(0, S + 1, size=E).astype(np.int32)  # incl. sentinel
    perm, seg_ptr = nb.counting_sort(key, S)
    ref_perm = np.argsort(key, kind="stable")
    np.testing.assert_array_equal(perm, ref_perm)
    ref_ptr = np.searchsorted(key[ref_perm], np.arange(S + 1))
    np.testing.assert_array_equal(seg_ptr, ref_ptr)


def test_counting_sort_rejects_out_of_range():
    with pytest.raises(ValueError, match="range"):
        nb.counting_sort(np.asarray([0, 5], np.int32), 4)


@pytest.mark.parametrize("E,S,seed", [(256, 17, 3), (4096, 300, 4),
                                      (1024, 5, 5)])
def test_tiled_aux_matches_numpy(E, S, seed):
    rng = np.random.default_rng(seed)
    key = np.sort(rng.integers(0, S, size=E - 32))
    key = np.concatenate([key, np.full(32, S)]).astype(np.int32)
    got = nb.tiled_aux(key, S, REDUCE_TILE)
    ref = _tiled_aux(key, S)
    for g, r, name in zip(got, ref, ("tl", "live_idx", "live_key",
                                     "live_last", "seg_ptr2")):
        np.testing.assert_array_equal(g, np.asarray(r, np.int32),
                                      err_msg=name)


@pytest.mark.parametrize("tiles,S,seed,hub", [
    (1, 40, 6, False), (4, 300, 7, False), (8, 17, 8, True),
])
@pytest.mark.parametrize("KW", [512, 384, 256])
def test_pallas_aux_matches_numpy(tiles, S, seed, hub, KW):
    rng = np.random.default_rng(seed)
    E = tiles * KW
    if hub:
        keys = np.concatenate([
            np.zeros(E // 2, np.int64),
            np.sort(rng.integers(1, S, size=E - 32 - E // 2)),
        ])
    else:
        keys = np.sort(rng.integers(0, S, size=E - 32))
    key = np.concatenate([keys, np.full(32, S)]).astype(np.int32)
    got = nb.pallas_aux(key, S, KW, KW)
    ref = pallas_seg_aux(key.astype(np.int64), S, KW, KW)
    np.testing.assert_array_equal(got.loc, ref.loc)
    np.testing.assert_array_equal(got.blk, ref.blk)
    np.testing.assert_array_equal(got.ptr2, ref.ptr2)
    np.testing.assert_array_equal(got.live_key, ref.live_key)


def test_tab_window_aux_matches_numpy():
    from pyhgt_tpu.sampling.sorted_batch import pallas_tab_window_aux

    rng = np.random.default_rng(31)
    B, L, K, W = 3, 240, 512, 512
    sizes = [3 * K + 100, 2 * K - 100, 3 * K]
    tab = np.concatenate([
        b * L + rng.integers(0, L, size=s) for b, s in enumerate(sizes)
    ]).astype(np.int64)
    got = nb.tab_window_aux(tab, B, L, K, W)
    ref = pallas_tab_window_aux(tab, B, L, K=K, W=W)
    assert ref is not None and got is not None
    np.testing.assert_array_equal(got.loc, ref.loc)
    np.testing.assert_array_equal(got.blk, ref.blk)
    np.testing.assert_array_equal(got.ptr2, ref.ptr2)
    # structure-violating inputs return None like the reference
    scrambled = rng.integers(0, B * L, size=tab.shape[0]).astype(np.int64)
    assert nb.tab_window_aux(scrambled, B, L, K, W) is None
    assert pallas_tab_window_aux(scrambled, B, L, K=K, W=W) is None


def test_sort_batch_native_equals_numpy():
    schema = GraphSchema(
        node_types=("paper", "author"),
        metas=(
            MetaRelation("paper", "author", "AP_write"),
            MetaRelation("author", "paper", "rev_AP_write"),
            MetaRelation("paper", "paper", "PP_cite"),
        ),
    )
    layout = BatchLayout(
        schema=schema, pad=PadSpec(node_cap=64, default_edge_cap=160)
    )
    em = EdgeStaticMeta.from_layout(layout)
    batch = synth_batch(layout, np.random.default_rng(9), din=8,
                        node_fill=0.8, edge_fill=0.7)
    a = sort_batch(batch, layout, em, native=False)
    b = sort_batch(batch, layout, em, native=True)
    import jax

    fa, ta = jax.tree_util.tree_flatten(a)
    fb, tb_ = jax.tree_util.tree_flatten(b)
    assert ta == tb_
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
