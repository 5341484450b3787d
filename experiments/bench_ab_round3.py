"""One-session A/B sweep of the round-3 perf candidates.

Batched into a single process because every remote compile through the
axon tunnel costs 30-60 s and the tunnel can die for hours (CLAUDE.md):
run once, print progressively.

Candidates (from the probe9 trace breakdown at the 155.3 ms floor,
docs/PERF_NOTES.md):
  1. seg_tile (K=W) sweep: the live-partials kernel family runs
     compute-bound at ~164 TFLOP/s and its MXU FLOPs are 2·E·(K+W)·D —
     K=W=256 halves the 35.4 ms of kernel time if grid overhead stays
     amortized. 256 is the floor (tab-window aux needs K,W >= L=240).
  2. edge_bwd='slab': ONE [E,2D] permute-gather + slab pair kernel
     replaces the backward's two [E,D] src permutes (25.6 ms total;
     permutes are row-size-bound: 2 KB rows move ~1.4x cheaper/byte).
  3. ONEHOT_BWD: scatter-free transpose for the static block gathers
     (8 serialized while-loop scatter-adds ≈ part of 6.4 ms).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    preset = "bench"
    if "--cpu" in sys.argv:  # CPU smoke of the sweep code paths
        jax.config.update("jax_platforms", "cpu")
        preset = "tiny"

    import pyhgt_tpu.ops.hgt as hgt_mod
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    results = {}

    def measure(tag, onehot=False, **overrides):
        hgt_mod.ONEHOT_BWD = onehot
        fl = build_flagship(preset, **overrides)
        batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
        se = fl.sort(batch)
        params = fl.init_params(jax.random.key(0), batch, se)
        tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                            clip_norm=0.25, params=params)
        state = TrainState.create(params, tx)
        step = make_train_step(fl.loss_fn_single(), tx)
        bargs = tuple(jax.device_put(np.asarray(a))
                      for a in fl.batch_args(batch))
        se_d = jax.device_put(se)
        y = jax.device_put(np.asarray(labels))
        rng = jax.random.key(1)
        for _ in range(3):
            state, loss = step(state, rng, *bargs, se_d, y)
        float(loss)  # hard sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, loss = step(state, rng, *bargs, se_d, y)
        lval = float(loss)
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(lval), lval
        results[tag] = round(dt * 1e3, 2)
        print(f"{tag}: {dt*1e3:.1f} ms/step", flush=True)
        with open("/tmp/bench_ab_round3_results.json", "w") as f:
            json.dump(results, f, indent=1)
        return dt * 1e3

    base = measure("baseline (155.3 expected)")
    t256 = measure("seg_tile=256", seg_tile=256)
    t384 = measure("seg_tile=384", seg_tile=384)
    best_tile = min((base, 0), (t256, 256), (t384, 384))[1]
    tile_kw = {"seg_tile": best_tile} if best_tile else {}
    slab = measure(f"slab bwd (tile={best_tile or 512})",
                   edge_bwd="slab", **tile_kw)
    onehot = measure(f"onehot bwd (tile={best_tile or 512})",
                     onehot=True, **tile_kw)
    combo_kw = dict(tile_kw)
    if slab < min(base, t256, t384):
        combo_kw["edge_bwd"] = "slab"
    measure("COMBINED best", onehot=onehot < min(base, t256, t384),
            **combo_kw)

    print("RESULTS", results, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
