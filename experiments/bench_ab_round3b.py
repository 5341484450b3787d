"""Round-3 follow-up sweep: asymmetric Pallas tile configs + slab retest.

First sweep (docs/runs/ab_round3_results.json): K=W=384 won at 134.0 ms
(vs 155.2 baseline K=W=512; 256 LOST at 142 — per-tile fixed costs beat
the FLOP saving below ~384). Open cells: K<W asymmetric configs (narrower
one-hot width at the 256 tile: (256,384)=640-wide vs (384,384)=768-wide)
and whether 'slab' helps at the chosen tile.
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
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        preset = "tiny"

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    results = {}

    def measure(tag, **overrides):
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
        float(loss)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, loss = step(state, rng, *bargs, se_d, y)
        lval = float(loss)
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(lval), lval
        results[tag] = round(dt * 1e3, 2)
        print(f"{tag}: {dt*1e3:.1f} ms/step", flush=True)
        with open("/tmp/bench_ab_round3b_results.json", "w") as f:
            json.dump(results, f, indent=1)
        return dt * 1e3

    measure("k384w384 (first-sweep winner)", seg_tile=384)
    measure("k256w384", seg_tile=256, seg_w=384)
    measure("k256w512", seg_tile=256, seg_w=512)
    measure("k384w512", seg_tile=384, seg_w=512)
    measure("k384 slab", seg_tile=384, edge_bwd="slab")
    measure("k256w384 slab", seg_tile=256, seg_w=384, edge_bwd="slab")

    print("RESULTS", results, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
