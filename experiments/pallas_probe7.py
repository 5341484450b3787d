"""Narrow-op ([E, 8]) kernel probes (round 2, after the 224 ms milestone).

Questions (marginal = chained-call method, see PERF_NOTES):
  n1. seg_sum_tiled [E,8] marginal (the XLA narrow path used by s_n etc.)
  n2. live_partials kernel on [E,8] (lane-padded one-hot matmul) marginal
  n3. softmax_tiled marginal (repeat of probe6-h for the same session)
  n4. VMEM headroom: live_partials at D=1024 input (acc 6 MB) compiles/runs
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.mean(leaves[0].astype(jnp.float32)))


def bench(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.ops.pallas_seg import live_partials
    from pyhgt_tpu.ops.sorted_hgt import (
        _softmax_tiled,
        seg_sum_csr,
        seg_sum_tiled,
    )

    fl = build_flagship("bench")
    batch, _ = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    se_d = jax.device_put(se)
    E = se.edge_tgt.shape[0]
    key = jax.random.key(2)
    att = jax.random.normal(key, (E, 8), jnp.float32)
    paux = jax.device_put(se.pseg_tgt)

    # n1: XLA tiled narrow marginal (x1 vs x4 chained)
    f1 = jax.jit(lambda a: seg_sum_tiled(
        a, se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt))
    bench(f1, att, name="n1 seg_sum_tiled [E,8] x1")
    f1c = jax.jit(lambda a: seg_sum_tiled(
        seg_sum_tiled(
            seg_sum_tiled(
                seg_sum_tiled(
                    a, se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt
                )[se_d.edge_tgt],
                se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt,
            )[se_d.edge_tgt],
            se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt,
        )[se_d.edge_tgt],
        se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt))
    bench(f1c, att, name="n1 seg_sum_tiled [E,8] x4 chained (w/ gathers)")

    # n2: pallas kernel narrow
    f2 = jax.jit(lambda a: seg_sum_csr(live_partials(a, paux), paux.ptr2))
    bench(f2, att, name="n2 live_partials [E,8] x1")
    f2c = jax.jit(lambda a: seg_sum_csr(live_partials(
        seg_sum_csr(live_partials(
            seg_sum_csr(live_partials(
                seg_sum_csr(live_partials(a, paux), paux.ptr2)[se_d.edge_tgt],
                paux), paux.ptr2)[se_d.edge_tgt],
            paux), paux.ptr2)[se_d.edge_tgt],
        paux), paux.ptr2))
    bench(f2c, att, name="n2 live_partials [E,8] x4 chained (w/ gathers)")

    # n3: softmax marginal re-check
    f3 = jax.jit(lambda a: _softmax_tiled(a, se_d))
    bench(f3, att, name="n3 softmax_tiled x1")
    f3c = jax.jit(lambda a: _softmax_tiled(
        _softmax_tiled(_softmax_tiled(_softmax_tiled(a, se_d), se_d), se_d),
        se_d))
    bench(f3c, att, name="n3 softmax_tiled x4 chained")

    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
