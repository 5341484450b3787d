"""Round-2 probe 5: Pallas live-partials segment sum vs XLA seg_sum_tiled.

Bench-scale tgt grouping (E=226304 sorted edges over N=13312 segments),
D=512 and D=8.  Run on the REAL chip; prints progressively.
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from pyhgt_tpu.ops.pallas_seg import live_partials
from pyhgt_tpu.ops.sorted_hgt import seg_sum_csr, seg_sum_tiled
from pyhgt_tpu.sampling.sorted_batch import _tiled_aux, pallas_seg_aux

E, N = 226304, 13312
rng = np.random.default_rng(0)
keys = np.sort(rng.integers(0, N, size=E - 1500))
keys = np.concatenate([keys, np.full(1500, N)]).astype(np.int64)

tl, li, lk, ll, sp2 = _tiled_aux(keys, N)
aux = pallas_seg_aux(keys, N)
tl, li, sp2 = jnp.asarray(tl), jnp.asarray(li), jnp.asarray(sp2)
loc_d = jax.device_put(jnp.asarray(aux.loc))
blk_d = jax.device_put(jnp.asarray(aux.blk))
ptr2_d = jax.device_put(jnp.asarray(aux.ptr2))
aux_d = aux.replace(loc=loc_d, blk=blk_d, ptr2=ptr2_d)


def sync(x):
    return float(jnp.sum(x))


def bench(fn, *args, iters=20):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


for D in (512, 8):
    data = jax.random.normal(jax.random.key(0), (E, D), jnp.float32)

    xla = jax.jit(lambda d: seg_sum_tiled(d, tl, li, sp2))
    r_xla = xla(data)
    t_xla = bench(xla, data)
    print(f"D={D} xla seg_sum_tiled: {t_xla*1e3:.2f} ms", flush=True)

    for prec in ("high", "fastest"):
        pal = jax.jit(
            lambda d, prec=prec: seg_sum_csr(
                live_partials(d, aux_d, precision=prec, interpret=False),
                ptr2_d,
            )
        )
        r_pal = pal(data)
        err = float(jnp.max(jnp.abs(r_pal - r_xla))) / (
            float(jnp.max(jnp.abs(r_xla))) + 1e-9
        )
        t_pal = bench(pal, data)
        print(f"D={D} pallas[{prec}]: {t_pal*1e3:.2f} ms  (rel err vs xla "
              f"{err:.2e})", flush=True)

    if D == 512:
        dbf = data.astype(jnp.bfloat16)
        pal = jax.jit(
            lambda d: seg_sum_csr(
                live_partials(d, aux_d, precision="fastest", interpret=False),
                ptr2_d,
            )
        )
        r = pal(dbf)
        t = bench(pal, dbf)
        print(f"D={D} pallas[bf16 in]: {t*1e3:.2f} ms", flush=True)

print("done", flush=True)
