"""Probe 4: marginal (in-one-jit, chained distinct instances) costs of the
edge-stage components, to pick the round-2 optimization targets.

 13. k_e gather+rte marginal (3 distinct tables chained)
 14. seg_sum_tiled [E,512] marginal
 15. permute-gather [E,512] marginal
 16. Pallas window-scatterT segment-reduce [E,512] marginal (the
     candidate seg_sum_tiled replacement; keys = tgt-sorted)
 17. gather-from-node-table in src-sorted order (the candidate backward
     restructure: q[tgt[perm_src]]) marginal
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.mean(jax.tree_util.tree_leaves(x)[0]))


def bench(fn, *args, iters=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def marginal(make_chain, args, name, ks=(1, 4)):
    d = {}
    for k in ks:
        f = jax.jit(make_chain(k))
        d[k] = bench(f, *args)
    m = (d[ks[1]] - d[ks[0]]) / (ks[1] - ks[0])
    print(f"{name}: x1 {d[ks[0]]*1e3:.2f} ms, x{ks[1]} {d[ks[1]]*1e3:.2f} ms"
          f" -> marginal {m*1e3:.2f} ms", flush=True)
    return m


def main():
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.ops.sorted_hgt import seg_sum_tiled

    fl = build_flagship("bench")
    batch, _ = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = jax.device_put(fl.sort(batch))
    E = int(se.edge_tgt.shape[0])
    D = 512
    Bb = len(fl.layout.blocks)
    C = fl.layout.node_cap
    N = fl.layout.num_types * C
    key = jax.random.key(0)
    k_rel = jax.random.normal(key, (Bb * C, D)) * 0.1
    k_tab = jax.random.normal(key, (Bb * 240, D)) * 0.1
    q_n = jax.random.normal(key, (N, D)) * 0.1
    data = jax.random.normal(key, (E, D)) * 0.1

    # 13. gather+rte marginal
    def mk13(k):
        def f(kr, kt):
            acc = jnp.zeros((D,))
            for j in range(k):
                acc = acc + jnp.sum(
                    (kr * (1 + 1e-4 * j))[se.gidx] + kt[se.tabidx], axis=0
                )
            return acc
        return f
    marginal(mk13, (k_rel, k_tab), "13 k_e gather+rte")

    # 14. seg_sum_tiled marginal
    def mk14(k):
        def f(d):
            acc = jnp.zeros((se.seg_ptr2_tgt.shape[0] - 1, D))
            for j in range(k):
                acc = acc + seg_sum_tiled(
                    d * (1 + 1e-4 * j), se.tl_tgt, se.live_idx_tgt,
                    se.seg_ptr2_tgt)
            return acc
        return f
    marginal(mk14, (data,), "14 seg_sum_tiled [E,512]")

    # 15. permute-gather marginal
    def mk15(k):
        def f(d):
            acc = jnp.zeros((D,))
            for j in range(k):
                acc = acc + jnp.sum((d * (1 + 1e-4 * j))[se.perm_src], axis=0)
            return acc
        return f
    marginal(mk15, (data,), "15 permute-gather [E,512]")

    # 16. Pallas window scatterT over tgt-sorted keys
    TE = 256
    TW = 128
    tgt = np.asarray(se.edge_tgt)
    key_sorted = np.where(np.asarray(se.edge_mask), tgt, N)
    tiles = E // TE
    tw0 = (key_sorted.reshape(tiles, TE)[:, 0] // TW).astype(np.int32)
    NWIN = (N + TW) // TW + 1  # +1 window for the padding sentinel rows
    lt = key_sorted - tw0.repeat(TE) * TW
    ok = (lt >= 0) & (lt < 2 * TW)
    frac_bad = 1 - ok.mean()
    lt = np.clip(lt, 0, 2 * TW - 1).astype(np.int32)
    first = np.ones(tiles, np.int32)
    first[1:] = (tw0[1:] != tw0[:-1]).astype(np.int32)
    tp = (-tiles) % 8
    lt2 = np.concatenate([lt.reshape(tiles, TE),
                          np.zeros((tp, TE), np.int32)], 0)

    def kernel(tw_ref, fl_ref, lt_ref, v_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(fl_ref[i] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        lt_ = lt_ref[i % 8]
        ohT = (jax.lax.broadcasted_iota(jnp.int32, (2 * TW, TE), 0)
               == lt_[None, :]).astype(jnp.bfloat16)
        o_ref[...] += jnp.dot(ohT, v_ref[...].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((8, TE), lambda i, tw, fl: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, D), lambda i, tw, fl: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2 * TW, D), lambda i, tw, fl: (tw[i], 0),
                               memory_space=pltpu.VMEM),
    )
    # NOTE: overlapping out windows (tw, tw+1 share rows) — revisits would
    # OVERWRITE, so this probe only measures speed with stride-2 windows;
    # correctness design comes later.
    pc = lambda tw, fl_, lt_, v: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(((NWIN + 2) * TW, D), jnp.float32),
    )(tw, fl_, lt_, v)

    def mk16(k):
        def f(v):
            acc = jnp.zeros(((NWIN + 2) * TW, D))
            for j in range(k):
                acc = acc + pc(jnp.asarray(tw0), jnp.asarray(first),
                               jnp.asarray(lt2), v * (1 + 1e-4 * j))
            return acc
        return f
    try:
        m = marginal(mk16, (data,), "16 pallas window-scatterT [E,512]")
        print(f"   (frac edges beyond 2-window span: {frac_bad:.4f})",
              flush=True)
    except Exception as e:
        print(f"16 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

    # 17. node-table gather composed with perm (backward restructure)
    tgt_perm = jnp.asarray(np.asarray(se.edge_tgt)[np.asarray(se.perm_src)])

    def mk17(k):
        def f(q):
            acc = jnp.zeros((D,))
            for j in range(k):
                acc = acc + jnp.sum((q * (1 + 1e-4 * j))[tgt_perm], axis=0)
            return acc
        return f
    marginal(mk17, (q_n,), "17 q[tgt[perm_src]] node-table gather")

    print("done", flush=True)


if __name__ == "__main__":
    main()
