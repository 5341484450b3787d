"""Round-4 follow-up chip probes: shape-family map + 2x-batch pricing.

ANSWERED (2026-08-20, docs/PERF_NOTES.md round-4b): the 26880 "crash
family" was neither an opaque backend bug nor worker poisoning — the
probe's tab-off cell (26880 clean in 46.5 s vs a 28-min compile wedge +
worker kernel fault with tab compaction) localized it to the
compact-table selection gather, whose autodiff transpose was a
duplicate-index scatter-add (the one scatter left in the edge stage).
Fixed with a one-hot matmul; every config below now runs:

- 26624 control: 121.0 -> 119.8 ms (compile 412 -> ~100-150 s)
- 26880 (+tab): was fault -> 121.6 ms, compile 66 s
- 26880:64 (two-region src v2, W=2*cap): 124.2 ms — LOSES +2.6 ms,
  matching v1's +2.8; all three singleton attacks are dead
- 53248 (2x batch): 225.3 ms = 7.80M edges/s (+3.1% — the optimizer/
  dispatch amortization; a training-semantics knob, not a bench change)

Each config runs in-process sequentially; a crash kills the process, so
results print progressively (JSON lines). Run:
  python experiments/bench_shapes_r4.py [edge_cap[:src_split[:tab_cap]]...]
(tab_cap -1 = bench preset's 64, 0 = compaction off)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_config(edge_cap: int, steps: int = 8, warmup: int = 2,
               src_split_cap: int = 0, tab_cap: int = -1) -> dict:
    import jax

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    overrides = dict(edge_cap=edge_cap, src_split_cap=src_split_cap)
    if tab_cap >= 0:  # -1 = keep the bench preset's value (64)
        overrides["tab_cap"] = tab_cap
    fl = build_flagship("bench", **overrides)
    batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se)
    tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                        clip_norm=0.25, params=params)
    state = TrainState.create(params, tx)
    step = make_train_step(fl.loss_fn_single(), tx)
    bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
    se_d = jax.device_put(se)
    y = jax.device_put(np.asarray(labels))
    rng = jax.random.key(1)
    t0 = time.time()
    for _ in range(warmup):
        state, loss = step(state, rng, *bargs, se_d, y)
    warm = float(loss)  # sync (block_until_ready unreliable on the tunnel)
    t_compile = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, rng, *bargs, se_d, y)
    lval = float(loss)
    dt = (time.perf_counter() - t0) / steps
    n_edges = int(np.sum(np.asarray(batch.edge_mask)))
    row = {
        "edge_cap": edge_cap,
        "src_split_cap": src_split_cap,
        "src_split_active": getattr(se, "pseg_src_lo", None) is not None,
        "n_edges": n_edges,
        "step_ms": round(dt * 1e3, 1),
        "edges_per_s": round(n_edges * fl.cfg.n_layers / dt, 1),
        "loss_finite": bool(np.isfinite(lval)),
        "compile_s": round(t_compile, 1),
        "tab_compacted": getattr(se, "tab_sel", None) is not None,
        "tgt_rank_capped": bool(getattr(se.pseg_tgt, "v", 0))
        if se.pseg_tgt is not None else False,
    }
    print(json.dumps(row), flush=True)
    return row


def main() -> int:
    if len(sys.argv) > 1:
        # each arg: edge_cap[:src_split_cap[:tab_cap]] (tab_cap -1 =
        # keep the bench preset's 64; 0 = compaction off)
        for a in sys.argv[1:]:
            parts = a.split(":")
            run_config(int(parts[0]),
                       src_split_cap=int(parts[1]) if len(parts) > 1 else 0,
                       tab_cap=int(parts[2]) if len(parts) > 2 else -1)
        return 0
    # default sequence — ordered so each answer stands even if a later
    # config crashes the process
    run_config(26624)            # production control (pre-crash sanity)
    run_config(26880)            # the round-4 crash family, plain
    run_config(26880, src_split_cap=64)  # two-region src v2 (W=2*cap),
    # unmeasured in round 4 (worker poisoning blocked the shape family)
    run_config(26624)            # control again
    run_config(53248)            # 2x batch: fixed-cost amortization
    return 0


if __name__ == "__main__":
    sys.exit(main())
