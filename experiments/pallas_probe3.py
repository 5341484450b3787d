"""Probe 3: dispatch-overhead calibration + exp8 bisection.

 9.  trivial jit (x+1 on 8 floats) — measures per-dispatch floor through
     the axon tunnel; every probe number is inflated by this
 10. N chained pallas_calls inside ONE jit — per-invocation cost on-device
 11. XLA gather re-measured with the dispatch floor subtracted
 12. fused scores kernel, att via block-diagonal ones matmul (no 3D
     reshape) — bisects the exp8 Mosaic INTERNAL error
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 226304
C = 3328
D = 512
B = 12
H, dk = 8, 64

rng = np.random.default_rng(0)
block_caps = [26624] * 8 + [3328] * 4
edge_block = np.repeat(np.arange(B), block_caps).astype(np.int32)
src_local = rng.integers(0, C, size=E).astype(np.int32)
gidx = (edge_block * C + src_local).astype(np.int32)
table = (rng.standard_normal((B * C, D)) * 0.1).astype(np.float32)
table_bf = table.astype(jnp.bfloat16)


def sync(x):
    return float(jnp.sum(x))


def bench(fn, *args, iters=20):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters


def exp9():
    x = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    dt = bench(f, x, iters=50)
    print(f"exp9 trivial-jit dispatch floor: {dt*1e3:.3f} ms", flush=True)
    # and a chain of 20 dependent trivial jit steps in one call
    g = jax.jit(lambda x: jax.lax.fori_loop(0, 20, lambda i, a: a + 1.0, x))
    dt2 = bench(g, x, iters=50)
    print(f"exp9 20-chained-adds one jit: {dt2*1e3:.3f} ms", flush=True)


def exp10():
    TE = 256
    tiles = E // TE
    tile_block = edge_block.reshape(tiles, TE)[:, 0].astype(np.int32)
    tp = (-tiles) % 8
    sl2 = np.concatenate(
        [src_local.reshape(tiles, TE), np.zeros((tp, TE), np.int32)], axis=0
    )

    def kernel(tb_ref, sl_ref, slab_ref, o_ref):
        i = pl.program_id(0)
        sl = sl_ref[i % 8]
        col = jax.lax.broadcasted_iota(jnp.int32, (TE, C), 1)
        oh = (sl[:, None] == col).astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(
            oh, slab_ref[0], preferred_element_type=jnp.float32
        )

    def one(tb, sl, slab):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((8, TE), lambda i, tb: (i // 8, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, D), lambda i, tb: (tb[i], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TE, D), lambda i, tb: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        )(tb, sl, slab)

    f1 = jax.jit(lambda tb, sl, slab: jnp.sum(one(tb, sl, slab), axis=0))

    def chain4(tb, sl, slab):
        acc = jnp.zeros((D,), jnp.float32)
        for _ in range(4):
            acc = acc + jnp.sum(one(tb, sl, slab), axis=0)
        return acc

    f4 = jax.jit(chain4)
    slab3 = jnp.asarray(table_bf).reshape(B, C, D)
    a = (jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
    d1 = bench(f1, *a, iters=10)
    d4 = bench(f4, *a, iters=10)
    print(f"exp10 slab-gather x1 in jit: {d1*1e3:.2f} ms; x4: {d4*1e3:.2f} ms"
          f" -> per-invocation {(d4-d1)/3*1e3:.2f} ms", flush=True)


def exp11():
    gid = jnp.asarray(gidx)
    t = jnp.asarray(table)

    def one(t, gid):
        return jnp.sum(t[gid] * 1.0001, axis=0)

    f1 = jax.jit(one)
    f4 = jax.jit(lambda t, gid: one(t, gid) + one(t * 1.0001, gid)
                 + one(t * 1.0002, gid) + one(t * 1.0003, gid))
    d1 = bench(f1, t, gid, iters=10)
    d4 = bench(f4, t, gid, iters=10)
    print(f"exp11 XLA-gather x1: {d1*1e3:.2f} ms; x4: {d4*1e3:.2f} ms "
          f"-> per-gather {(d4-d1)/3*1e3:.2f} ms", flush=True)


def exp12():
    TE = 256
    tiles = E // TE
    TW = 128
    N = 4 * C
    tile_block = edge_block.reshape(tiles, TE)[:, 0].astype(np.int32)
    tp = (-tiles) % 8
    sl2 = np.concatenate(
        [src_local.reshape(tiles, TE), np.zeros((tp, TE), np.int32)], axis=0
    )
    tgt_win = (np.arange(tiles) % (N // TW)).astype(np.int32)
    tl2 = rng.integers(0, TW, size=(tiles + tp, TE)).astype(np.int32)
    tl2[tiles:] = 0
    q = (rng.standard_normal((N // TW, TW, D)) * 0.1).astype(np.float32)
    # block-diagonal head reducer: [D, H] with 1 where row//dk == col
    headsum = np.zeros((D, 128), np.float32)
    for h in range(H):
        headsum[h * dk:(h + 1) * dk, h] = 1.0

    def kernel(tb_ref, qw_ref, sl_ref, tl_ref, slab_ref, qwin_ref, hs_ref,
               o_ref):
        i = pl.program_id(0)
        sl = sl_ref[i % 8]
        tl = tl_ref[i % 8]
        col = jax.lax.broadcasted_iota(jnp.int32, (TE, C), 1)
        oh = (sl[:, None] == col).astype(jnp.bfloat16)
        k_e = jnp.dot(oh, slab_ref[0], preferred_element_type=jnp.float32)
        colw = jax.lax.broadcasted_iota(jnp.int32, (TE, TW), 1)
        ohw = (tl[:, None] == colw).astype(jnp.bfloat16)
        q_e = jnp.dot(ohw, qwin_ref[0].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        prod = q_e * k_e                                     # [TE, D]
        att = jax.lax.dot_general(
            prod, hs_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # [TE, 128]
        o_ref[...] = att / jnp.sqrt(jnp.float32(dk))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((8, TE), lambda i, tb, qw: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TE), lambda i, tb, qw: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, D), lambda i, tb, qw: (tb[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TW, D), lambda i, tb, qw: (qw[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 128), lambda i, tb, qw: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TE, 128), lambda i, tb, qw: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda tb, qw, sl, tl, slab, q_, hs: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, 128), jnp.float32),
        )(tb, qw, sl, tl, slab, q_, hs)
    )
    slab3 = jnp.asarray(table_bf).reshape(B, C, D)
    try:
        args = (jnp.asarray(tile_block), jnp.asarray(tgt_win),
                jnp.asarray(sl2), jnp.asarray(tl2), slab3, jnp.asarray(q),
                jnp.asarray(headsum))
        out = f(*args)
        k_ref = np.asarray(table_bf)[gidx].astype(np.float32)
        q_ref = q.reshape(N, D)[
            (tgt_win.repeat(TE) * TW + tl2[:tiles].reshape(-1)).astype(np.int64)
        ]
        att_ref = ((q_ref.astype(np.float32) * k_ref)
                   .reshape(E, H, dk).sum(-1) / np.sqrt(dk))
        err = float(np.max(np.abs(np.asarray(out)[:, :H] - att_ref)))
        dt = bench(f, *args, iters=10)
        print(f"exp12 fused-scores(blockdiag) TE=256: {dt*1e3:.2f} ms "
              f"(err {err:.1e})", flush=True)
    except Exception as e:
        print(f"exp12 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in (exp9, exp10, exp11, exp12):
        try:
            fn()
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
