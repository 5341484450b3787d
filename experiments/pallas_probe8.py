"""Backward permute+reduce economics (round 2, after the softmax kernel).

The backward's 4 permuted [E, D] segment reductions per layer are the
dominant remaining cost (probe6: permute ~4.4 ms + kernel ~3.2 ms each).
Hypothesis: the permute-gather is row-size bound (1 KB bf16 rows), so
pairing g_k/g_v into one [E, 2D] permute (2 KB rows) may halve gather
cost even though the paired kernel pays 2x one-hot FLOPs (probe6-f2).

Marginals measured by chaining distinct calls inside one jit:
  p1. permute [E,512]bf16 x1 vs x3 chained      (1 KB rows)
  p2. permute [E,1024]bf16 x1 vs x3 chained     (2 KB rows)
  p3. permute [E,512]f32 x1 vs x3 chained       (2 KB rows, f32)
  p4. full pair chain: product+permute+kernel — separate vs paired
  p5. softmax: tiled vs pallas online-partials kernel (x4 chained)
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
        _softmax_pallas,
        _softmax_tiled,
        seg_sum_csr,
    )

    fl = build_flagship("bench")
    batch, _ = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    se_d = jax.device_put(se)
    E = se.edge_tgt.shape[0]
    key = jax.random.key(2)
    bf = jnp.bfloat16
    perm = se_d.perm_src
    paux_s = jax.device_put(se.pseg_src)

    d512 = (jax.random.normal(key, (E, 512), jnp.float32) * 0.1).astype(bf)
    d512b = d512 * 1.001
    d512c = d512 * 0.999
    d1024 = jnp.concatenate([d512, d512b], axis=1)
    f512 = d512.astype(jnp.float32)

    def chain(x, n, f):
        for i in range(n):
            x = f(x * (1.0 + 1e-4 * i))
        return x

    g1 = jax.jit(lambda d: d[perm])
    bench(g1, d512, name="p1 permute [E,512]bf16 x1")
    g1c = jax.jit(lambda d: chain(d, 3, lambda y: y[perm]))
    bench(g1c, d512, name="p1 permute [E,512]bf16 x3 chained")

    g2 = jax.jit(lambda d: d[perm])
    bench(g2, d1024, name="p2 permute [E,1024]bf16 x1")
    g2c = jax.jit(lambda d: chain(d, 3, lambda y: y[perm]))
    bench(g2c, d1024, name="p2 permute [E,1024]bf16 x3 chained")

    g3 = jax.jit(lambda d: d[perm])
    bench(g3, f512, name="p3 permute [E,512]f32 x1")
    g3c = jax.jit(lambda d: chain(d, 3, lambda y: y[perm]))
    bench(g3c, f512, name="p3 permute [E,512]f32 x3 chained")

    # p4: the real backward pattern per grouping.
    coef = jax.random.normal(key, (E, 8), jnp.float32)
    w8 = jax.random.normal(jax.random.key(3), (E, 8), jnp.float32)

    def sep(a, b):
        gk = (coef[:, :, None] * a.astype(jnp.float32).reshape(E, 8, 64)
              ).reshape(E, 512).astype(bf)
        gv = (w8[:, :, None] * b.astype(jnp.float32).reshape(E, 8, 64)
              ).reshape(E, 512).astype(bf)
        rk = seg_sum_csr(live_partials(gk[perm], paux_s), paux_s.ptr2)
        rv = seg_sum_csr(live_partials(gv[perm], paux_s), paux_s.ptr2)
        return rk + rv

    def paired(a, b):
        gk = (coef[:, :, None] * a.astype(jnp.float32).reshape(E, 8, 64)
              ).reshape(E, 512)
        gv = (w8[:, :, None] * b.astype(jnp.float32).reshape(E, 8, 64)
              ).reshape(E, 512)
        gkv = jnp.concatenate([gk, gv], axis=1).astype(bf)
        r = seg_sum_csr(live_partials(gkv[perm], paux_s), paux_s.ptr2)
        return r[:, :512] + r[:, 512:]

    bench(jax.jit(sep), d512, d512b, name="p4 separate product+perm+kern x1")
    bench(jax.jit(lambda a, b: sep(a, b)[: E].sum() + sep(a * 1.001, b)[0, 0]),
          d512, d512b, iters=3, name="p4 separate x2 chained")
    bench(jax.jit(paired), d512, d512b, name="p4 paired product+perm+kern x1")
    bench(jax.jit(lambda a, b: paired(a, b)[: E].sum()
                  + paired(a * 1.001, b)[0, 0]),
          d512, d512b, iters=3, name="p4 paired x2 chained")

    # p5: softmax tiled vs pallas kernel
    att = jax.random.normal(key, (E, 8), jnp.float32)
    s1 = jax.jit(lambda a: _softmax_tiled(a, se_d))
    bench(s1, att, name="p5 softmax tiled x1")
    s1c = jax.jit(lambda a: chain(a, 4, lambda y: _softmax_tiled(y, se_d)))
    bench(s1c, att, name="p5 softmax tiled x4 chained")
    s2 = jax.jit(lambda a: _softmax_pallas(a, se_d))
    bench(s2, att, name="p5 softmax pallas x1")
    s2c = jax.jit(lambda a: chain(a, 4, lambda y: _softmax_pallas(y, se_d)))
    bench(s2c, att, name="p5 softmax pallas x4 chained")

    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
