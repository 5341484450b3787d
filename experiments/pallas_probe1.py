"""Round-2 probe: Pallas gather/scatter primitive designs vs XLA gathers.

Run on the REAL chip. Measures, at bench scale (E=226304, C=3328, D=512,
B=12 blocks):

  0. sanity: trivial Pallas copy kernel compiles+runs on this toolchain
  1. XLA random row gather baseline (fused into a consumer)
  2. Pallas slab-resident one-hot gather (block-major edges, bf16 slab,
     MXU one-hot matmul) — PrefetchScalarGridSpec index_map residency
  3. Pallas window gather (edges src-sorted within (block, tgt-window)
     runs; two adjacent 512-row windows; one-hot over 1024)
  4. Pallas window scatterT accumulate (tgt windows, monotone out blocks)

Prints one line per experiment progressively. Each remote compile costs
30-60 s — patience.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 226304
TE = 128
TILES = E // TE
C = 3328
D = 512
B = 12
W = 512  # src window rows
TW = 128  # tgt window rows
N = 4 * C  # flat node count

rng = np.random.default_rng(0)

# block-major edge layout mirroring flagship bench: 8 blocks of 26624 +
# 4 self blocks of 3328
block_caps = [26624] * 8 + [3328] * 4
edge_block = np.repeat(np.arange(B), block_caps).astype(np.int32)
assert edge_block.shape[0] == E
src_local = rng.integers(0, C, size=E).astype(np.int32)
gidx = (edge_block * C + src_local).astype(np.int32)

table = (rng.standard_normal((B * C, D)) * 0.1).astype(np.float32)
table_bf = table.astype(jnp.bfloat16)


def sync(x):
    return float(jnp.sum(x))  # block_until_ready unreliable on axon


def bench(fn, *args, iters=10):
    out = fn(*args)
    s = sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters, s


# ---------------------------------------------------------------- exp 0
def exp0():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    f = jax.jit(
        lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    )
    y = f(x)
    ok = bool(jnp.allclose(y, x * 2.0))
    print(f"exp0 pallas-sanity: ok={ok}", flush=True)


# ---------------------------------------------------------------- exp 1
def exp1():
    gid = jnp.asarray(gidx)
    t = jnp.asarray(table)

    @jax.jit
    def f(t, gid):
        rows = t[gid]                      # [E, D] random gather
        return jnp.sum(rows * 1.0001, axis=0)  # fused consumer

    dt, _ = bench(f, t, gid)
    gbs = E * D * 4 / dt / 1e9
    print(f"exp1 XLA-random-gather: {dt*1e3:.2f} ms  ({gbs:.1f} GB/s eff)",
          flush=True)


# ---------------------------------------------------------------- exp 2
def exp2():
    tile_block = edge_block.reshape(TILES, TE)[:, 0].astype(np.int32)
    sl2 = src_local.reshape(TILES, TE)

    def kernel(tb_ref, sl_ref, slab_ref, o_ref):
        i = pl.program_id(0)
        sl = sl_ref[i % 8]                                 # [TE]
        col = jax.lax.broadcasted_iota(jnp.int32, (TE, C), 1)
        oh = (sl[:, None] == col).astype(jnp.bfloat16)
        o_ref[...] = jnp.dot(
            oh, slab_ref[0], preferred_element_type=jnp.float32
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(TILES,),
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
    out = f(jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
    ref = table_bf[gidx].astype(np.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    dt, _ = bench(f, jnp.asarray(tile_block), jnp.asarray(sl2), slab3)
    print(f"exp2 pallas-slab-onehot-gather: {dt*1e3:.2f} ms  (err {err:.2e})",
          flush=True)


# ---------------------------------------------------------------- exp 3
def exp3():
    # src-sorted within 2048-edge runs (= one tgt window's edge run);
    # restrict to the 8 big blocks so runs never cross a block boundary
    run_len = 2048
    Epad = 8 * 26624            # 26624 % 2048 == 0
    n_runs = Epad // run_len
    sl = src_local[:Epad].reshape(n_runs, run_len)
    sl = np.sort(sl, axis=1).reshape(Epad)
    blk = edge_block[:Epad]
    gid = (blk * C + sl).astype(np.int32)
    tiles = Epad // TE
    # per tile: base window (multiple of W) covering the tile's min src
    tmin = sl.reshape(tiles, TE).min(axis=1)
    twin = (tmin // W).astype(np.int32)
    span = sl.reshape(tiles, TE).max(axis=1) - (twin * W)
    assert (span < 2 * W).all(), span.max()
    tblk = blk.reshape(tiles, TE)[:, 0].astype(np.int32)
    lidx = (sl - (twin * W)[np.repeat(np.arange(tiles), TE)]).astype(np.int32)
    lidx2 = lidx.reshape(tiles, TE)

    NW = C // W  # windows per block (C multiple of W? 3328/512=6.5 -> pad)
    Cpad = ((C + W - 1) // W) * W
    NW = Cpad // W
    tab = np.zeros((B, Cpad, D), np.float32)
    tab[:, :C] = table.reshape(B, C, D)
    tab_bf = jnp.asarray(tab.astype(jnp.bfloat16)).reshape(B * NW, W, D)
    # global window index per tile
    gwin = (tblk * NW + twin).astype(np.int32)

    def kernel(gw_ref, sl_ref, w0_ref, w1_ref, o_ref):
        i = pl.program_id(0)
        sl_ = sl_ref[i % 8]
        col = jax.lax.broadcasted_iota(jnp.int32, (TE, 2 * W), 1)
        oh = (sl_[:, None] == col).astype(jnp.bfloat16)
        win = jnp.concatenate([w0_ref[0], w1_ref[0]], axis=0)  # [2W, D]
        o_ref[...] = jnp.dot(oh, win, preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((8, TE), lambda i, gw: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D), lambda i, gw: (gw[i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, D),
                         lambda i, gw: (jnp.minimum(gw[i] + 1, B * NW - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TE, D), lambda i, gw: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    f = jax.jit(
        lambda gw, sl_, t: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Epad, D), jnp.float32),
        )(gw, sl_, t, t)
    )
    out = f(jnp.asarray(gwin), jnp.asarray(lidx2), tab_bf)
    ref = np.asarray(table_bf)[gid].astype(np.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    dt, _ = bench(lambda a,b,c: f(a,b,c), jnp.asarray(gwin), jnp.asarray(lidx2), tab_bf)
    print(f"exp3 pallas-window-gather: {dt*1e3:.2f} ms  (err {err:.2e})",
          flush=True)


# ---------------------------------------------------------------- exp 4
def exp4():
    # tgt-window scatterT: edges tgt-sorted globally; accumulate
    # per-window [TW, D] sums of per-edge values (monotone out blocks)
    tgt = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    twin = (tgt // TW).astype(np.int32)
    tile_win = twin.reshape(TILES, TE)
    # a tile may straddle windows; route every edge to its own window via
    # TWO output visits is complex — here measure the common case by
    # clamping each tile to its first window (perf probe only)
    tw0 = tile_win[:, 0]
    lt = (tgt - tw0[np.repeat(np.arange(TILES), TE)] * TW)
    valid = (lt >= 0) & (lt < TW)
    lt = np.where(valid, lt, 0).astype(np.int32)
    first = np.ones(TILES, np.int32)
    first[1:] = (tw0[1:] != tw0[:-1]).astype(np.int32)
    vals = (rng.standard_normal((E, D)) * 0.1).astype(np.float32)

    def kernel(tw_ref, fl_ref, lt_ref, v_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(fl_ref[i] == 1)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        lt_ = lt_ref[i % 8]
        ohT = (jax.lax.broadcasted_iota(jnp.int32, (TW, TE), 0)
               == lt_[None, :]).astype(jnp.bfloat16)
        o_ref[...] += jnp.dot(
            ohT, v_ref[...].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((8, TE), lambda i, tw, fl: (i // 8, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TE, D), lambda i, tw, fl: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TW, D), lambda i, tw, fl: (tw[i], 0),
                               memory_space=pltpu.VMEM),
    )
    NWIN = N // TW
    f = jax.jit(
        lambda tw, fl, lt_, v: pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((NWIN * TW, D), jnp.float32),
        )(tw, fl, lt_, v)
    )
    out = f(jnp.asarray(tw0), jnp.asarray(first),
            jnp.asarray(lt.reshape(TILES, TE)), jnp.asarray(vals))
    dt, _ = bench(f, jnp.asarray(tw0), jnp.asarray(first),
                  jnp.asarray(lt.reshape(TILES, TE)), jnp.asarray(vals))
    # correctness (approximate: clamped straddle edges excluded)
    seg = tw0.repeat(TE) * TW + lt
    ref = np.zeros((NWIN * TW, D), np.float32)
    np.add.at(ref, seg[valid.reshape(E)],
              vals[valid.reshape(E)].astype(np.float32))
    # bf16 rounding of vals
    err = float(np.max(np.abs(np.asarray(out) - ref)))
    print(f"exp4 pallas-window-scatterT: {dt*1e3:.2f} ms  (err {err:.2e})",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name, fn in [("exp0", exp0), ("exp1", exp1), ("exp2", exp2),
                     ("exp3", exp3), ("exp4", exp4)]:
        try:
            fn()
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}: {e}", flush=True)
