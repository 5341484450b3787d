"""One-session A/B sweep of the round-4 perf candidates (VERDICT r3 #1/3/4).

Batched into a single process because every remote compile through the
axon tunnel costs 30-60 s (CLAUDE.md); run once, print progressively.

Candidates (from the probe9 re-trace at the 128.1 ms floor,
docs/PERF_NOTES.md round-3):
  1. tab compaction (``tab_cap=64``): remap the RTE table space to
     per-block occupied-Δt ranks (bench: 60 of 240 slots) — the 8 tab
     pair kernel calls' one-hot narrows 480 -> 128 wide (7.6 ms group).
  2. two-region src reduction (``src_split_cap=64``): meta blocks
     through a rank-capped kernel (one-hot 768 -> 128), the
     singleton-dominated self-block tail through a plain cumsum-diff
     CSR — replaces round-3's losing bypass-gather singleton split
     (9.3 ms group). Needs tile-aligned meta caps: edge_cap 26880.
  3. ``softmax_tilemax='auto'``: the measured −2.7 ms tilemax softmax
     behind a runtime spread guard (lax.cond fallback — always exact).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = "/tmp/bench_ab_round4_results.json"


def main() -> int:
    import jax

    preset = "bench"
    if "--cpu" in sys.argv:  # CPU smoke of the sweep code paths
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
        n_edges = int(np.asarray(batch.edge_mask).sum())
        engaged = dict(
            tab=se.tab_sel is not None,
            src_lo=se.pseg_src_lo is not None,
        )
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
        eps = n_edges * fl.cfg.n_layers / dt
        results[tag] = dict(ms=round(dt * 1e3, 2),
                            medges_s=round(eps / 1e6, 3),
                            n_edges=n_edges, **engaged)
        print(f"{tag}: {dt*1e3:.1f} ms/step, {eps/1e6:.2f}M edges/s "
              f"{engaged}", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        return dt * 1e3

    base = measure("baseline (128.1 expected)")
    # isolate the cap-alignment change src_split needs
    cap = measure("aligned caps 26880", edge_cap=26880)
    tab = measure("tab_cap=64", tab_cap=64)
    src = measure("src_split=64 (aligned caps)", edge_cap=26880,
                  src_split_cap=64)
    both = measure("tab+src (aligned caps)", edge_cap=26880,
                   src_split_cap=64, tab_cap=64)

    combo = dict(edge_cap=26880, src_split_cap=64, tab_cap=64)
    if src >= cap:      # src split lost: drop it (and the cap change)
        combo = dict(tab_cap=64) if tab < base else {}
    elif tab >= base:   # tab lost: keep src only
        combo = dict(edge_cap=26880, src_split_cap=64)
    auto = measure("best+tilemax=auto", softmax_tilemax="auto", **combo)
    on = measure("best+tilemax=on", softmax_tilemax="on", **combo)
    print("RESULTS", json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
