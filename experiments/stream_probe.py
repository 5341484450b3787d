"""HBM stream / product-fusion / gather bandwidth probe (round-5, VERDICT
r4 weak #4: the must-move-bytes roofline accounting).

The round-4b trace attributes ~37.5 ms/step to 16 product-build fusions
(4/layer: fwd msg, bwd g_q_n operand, g_k_e, g_v_e — `_head_expand` dot
+ mul + convert writing bf16[E,512]) at ~300 GB/s effective on an
819 GB/s chip. This probe measures, at the exact bench shapes
(E=226,304, D=512, H=8):

  copy            bf16 [E,D] elementwise scale — the stream ceiling
  product_xla     the production product site: bf16 msg = expand(w) * v
                  (one-hot [H,D] MXU expand, bf16 multiply — exactly
                  ops/sorted_hgt._head_expand_like's form)
  product_pallas  the same product as a hand-tiled Pallas kernel (one
                  VMEM pass per 512-row tile) — tests whether XLA's
                  fusion layout, not physics, sets the 300 GB/s
  gather_rand     v[perm] for a uniform random permutation — the
                  random-access floor behind the permute/gather 26 ms
  gather_local    v[perm] with a window-local permutation (shuffle
                  within 4096-row windows) — the locality headroom

Each line reports effective GB/s over the minimum must-move bytes
(reads + writes of the [E,*] operands only). Run on the chip; --cpu for
a smoke test. Results belong in docs/PERF_NOTES.md round-5.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--e", type=int, default=226_304)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        args.e = min(args.e, 8192)
        args.iters = 3

    E, D, H = args.e, args.d, args.heads
    dk = D // H
    key = jax.random.key(0)
    kv, kw = jax.random.split(key)
    # data made ON DEVICE (the tunnel moves ~1 MB/s; never device_put this)
    v = jax.random.normal(kv, (E, D), jnp.bfloat16)
    w = jax.random.normal(kw, (E, H), jnp.float32)
    expand = np.repeat(np.eye(H, dtype=np.float32), dk, axis=1)  # [H, D]
    rng = np.random.default_rng(0)
    perm_rand = jnp.asarray(rng.permutation(E).astype(np.int32))
    win = 1024 if E % 4096 else 4096     # bench E=226,304 = 221*1024
    pl_loc = np.arange(E).reshape(-1, win)
    for row in pl_loc:
        rng.shuffle(row)
    perm_local = jnp.asarray(pl_loc.reshape(-1).astype(np.int32))

    w_full = jax.random.normal(jax.random.key(2), (E, D), jnp.bfloat16)

    def product_xla(v_, w_):
        we = jax.lax.dot_general(
            w_, jnp.asarray(expand), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return we * v_

    # ---- Pallas streaming product ----
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    K = 512

    def _prod_kernel(w_ref, v_ref, exp_ref, out_ref):
        we = jax.lax.dot_general(
            w_ref[...], exp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        out_ref[...] = we * v_ref[...]

    @jax.jit
    def product_pallas(v_, w_):
        tiles = E // K
        return pl.pallas_call(
            _prod_kernel,
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((K, H), lambda t: (t, 0)),
                pl.BlockSpec((K, D), lambda t: (t, 0)),
                pl.BlockSpec((H, D), lambda t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K, D), lambda t: (t, 0)),
            out_shape=jax.ShapeDtypeStruct((E, D), jnp.bfloat16),
            interpret=jax.default_backend() == "cpu",
        )(w_, v_, jnp.asarray(expand))

    # every case maps [E,D] bf16 -> [E,D] bf16, so R applications chain
    # serially inside ONE dispatch (fori_loop: no cross-iteration folding)
    # and the tunnel's sync round-trip amortizes over the chain
    R = 3 if args.cpu else 25
    cases = {
        "copy": (lambda acc, w_: acc * jnp.bfloat16(1.0001),
                 2 * E * D * 2),
        "product_xla": (lambda acc, w_: product_xla(acc, w_),
                        E * D * 2 * 2 + E * H * 4),
        "product_pallas": (lambda acc, w_: product_pallas(acc, w_),
                           E * D * 2 * 2 + E * H * 4),
        # attribution control: pure elementwise mul with a pre-expanded
        # [E, D] weight (no head-expand dot) — isolates whether the
        # expand matmul or the mul stream sets the product ceiling
        "product_mul": (lambda acc, w_: acc * w_full,
                        3 * E * D * 2),
        "gather_rand": (lambda acc, w_: acc[perm_rand],
                        2 * E * D * 2 + E * 4),
        "gather_local": (lambda acc, w_: acc[perm_local],
                         2 * E * D * 2 + E * 4),
    }
    for name, (fn, bytes_min) in cases.items():
        chained = jax.jit(
            lambda v_, w_, fn=fn: jax.lax.fori_loop(
                0, R, lambda i, acc: fn(acc, w_), v_
            )
        )
        out = chained(v, w)
        float(jnp.sum(out[0]))          # compile + sync through a fetch
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = chained(v, w)
            float(jnp.sum(out[0]))      # tiny fetch = real sync (tunnel)
            ts.append((time.perf_counter() - t0) / R)
        med = float(np.median(ts))
        print(json.dumps(dict(
            case=name, e=E, d=D, ms=round(med * 1e3, 3),
            min_bytes_mb=round(bytes_min / 1e6, 1),
            eff_gbps=round(bytes_min / med / 1e9, 1),
        )), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
