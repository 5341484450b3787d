"""Probe 2: grid-step overhead, big-tile slab gather, dynamic VMEM rows.

  5. per-grid-step overhead: trivial kernel at 1768/884/442/221 steps
  6. TE=512 slab one-hot gather (overhead amortized + MXU rate check)
  7. dynamic per-row VMEM gather (fori_loop of slab_ref[pl.ds(idx,1),:])
  8. fused scores prototype at TE=256: K slab + q window + SDDMM -> att
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


def bench(fn, *args, iters=10):
    out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- exp 5
def exp5():
    x = jnp.ones((E, 8), jnp.float32)
    for TE in (128, 256, 512, 1024):
        tiles = E // TE

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        f = jax.jit(
            lambda x: pl.pallas_call(
                kernel,
                grid=(tiles,),
                in_specs=[pl.BlockSpec((TE, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((TE, 8), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((E, 8), jnp.float32),
            )(x)
        )
        dt = bench(f, x)
        print(f"exp5 trivial-grid TE={TE}: {dt*1e3:.2f} ms "
              f"({dt/tiles*1e6:.2f} us/step, {tiles} steps)", flush=True)


# ---------------------------------------------------------------- exp 6
def exp6():
    for TE in (256, 512):
        tiles = E // TE
        tile_block = edge_block.reshape(tiles, TE)[:, 0].astype(np.int32)
        tp = (-tiles) % 8
        sl2 = np.concatenate(
            [src_local.reshape(tiles, TE),
             np.zeros((tp, TE), np.int32)], axis=0)

        def kernel(tb_ref, sl_ref, slab_ref, o_ref):
            i = pl.program_id(0)
            sl = sl_ref[i % 8]
            col = jax.lax.broadcasted_iota(jnp.int32, (TE, C), 1)
            oh = (sl[:, None] == col).astype(jnp.bfloat16)
            o_ref[...] = jnp.dot(
                oh, slab_ref[0], preferred_element_type=jnp.float32
            )

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
        f = jax.jit(
            lambda tb, sl, slab: pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
            )(tb, sl, slab)
        )
        slab3 = jnp.asarray(table_bf).reshape(B, C, D)
        try:
            out = f(jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
            ref = table_bf[gidx].astype(np.float32)
            err = float(jnp.max(jnp.abs(out - ref)))
            dt = bench(f, jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
            print(f"exp6 slab-onehot TE={TE}: {dt*1e3:.2f} ms (err {err:.1e})",
                  flush=True)
        except Exception as e:
            print(f"exp6 TE={TE} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


# ---------------------------------------------------------------- exp 7
def exp7():
    TE = 128
    tiles = E // TE
    tile_block = edge_block.reshape(tiles, TE)[:, 0].astype(np.int32)
    sl2 = src_local.reshape(tiles, TE)

    def kernel(tb_ref, sl_ref, slab_ref, o_ref):
        i = pl.program_id(0)
        sl = sl_ref[i % 8]

        def body(j, acc):
            row = slab_ref[0, pl.ds(sl[j], 1), :]      # dynamic VMEM row
            return jax.lax.dynamic_update_slice(acc, row, (j, 0))

        acc = jnp.zeros((TE, D), jnp.float32)
        o_ref[...] = jax.lax.fori_loop(0, TE, body, acc)

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
    f = jax.jit(
        lambda tb, sl, slab: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.float32),
        )(tb, sl, slab)
    )
    slab3 = jnp.asarray(table).reshape(B, C, D)
    try:
        out = f(jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
        ref = table[gidx]
        err = float(jnp.max(jnp.abs(out - ref)))
        dt = bench(f, jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
        print(f"exp7 dynamic-vmem-row gather: {dt*1e3:.2f} ms (err {err:.1e})",
              flush=True)
    except Exception as e:
        print(f"exp7 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------------------------------------------------------- exp 8
def exp8():
    # fused scores prototype: att = rowsum((q_e*k_e).reshape(H,dk)) at
    # TE=256; K slab resident; q via 128-row window pair; out [E, H]
    TE = 256
    tiles = E // TE
    TW = 128
    N = 4 * C
    tile_block = edge_block.reshape(tiles, TE)[:, 0].astype(np.int32)
    tp = (-tiles) % 8
    sl2 = np.concatenate(
        [src_local.reshape(tiles, TE), np.zeros((tp, TE), np.int32)], axis=0)
    # synthetic targets: contiguous windows per tile (shape probe only)
    tgt_win = (np.arange(tiles) % (N // TW)).astype(np.int32)
    tl2 = rng.integers(0, TW, size=(tiles + tp, TE)).astype(np.int32)
    tl2[tiles:] = 0
    q = (rng.standard_normal((N // TW, TW, D)) * 0.1).astype(np.float32)

    def kernel(tb_ref, qw_ref, sl_ref, tl_ref, slab_ref, qwin_ref, o_ref):
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
        att = jnp.sum((q_e * k_e).reshape(TE, H, dk), axis=-1)
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
        ],
        out_specs=pl.BlockSpec((TE, H), lambda i, tb, qw: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda tb, qw, sl, tl, slab, q_: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((E, H), jnp.float32),
        )(tb, qw, sl, tl, slab, q_)
    )
    slab3 = jnp.asarray(table_bf).reshape(B, C, D)
    try:
        args = (jnp.asarray(tile_block), jnp.asarray(tgt_win),
                jnp.asarray(sl2), jnp.asarray(tl2), slab3, jnp.asarray(q))
        out = f(*args)
        # reference
        k_ref = np.asarray(table_bf)[gidx].astype(np.float32)
        q_ref = q.reshape(N, D)[
            (tgt_win.repeat(TE) * TW
             + tl2[:tiles].reshape(-1)).astype(np.int64)
        ]
        att_ref = ((q_ref.astype(np.float32) * k_ref)
                   .reshape(E, H, dk).sum(-1) / np.sqrt(dk))
        err = float(np.max(np.abs(np.asarray(out) - att_ref)))
        dt = bench(f, *args)
        print(f"exp8 fused-scores TE=256: {dt*1e3:.2f} ms (err {err:.1e})",
              flush=True)
    except Exception as e:
        print(f"exp8 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for fn in (exp5, exp6, exp7, exp8):
        try:
            fn()
        except Exception as e:
            print(f"{fn.__name__} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
