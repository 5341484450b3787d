"""One-session A/B sweep of the round-2 pending perf questions.

Batched into a single process because every remote compile through the
axon tunnel costs 30-60 s and the tunnel can die for hours (CLAUDE.md):
run once, print progressively.

Questions (docs/PERF_NOTES.md round-2):
  1. WEIGHTED_KERNEL on vs off — the fused weighted segment-sum routing
     (live_partials_weighted) landed while the tunnel was down; both
     operands are HBM-resident so the fusion rule predicts a win.
  2. edge_bwd=recompute at the new 155 ms floor — its economics changed
     twice (head-matmul layout fix + weighted kernel); re-verify permute
     stays the right default.
  3. softmax_pallas at the new floor (third measurement under different
     fusion surroundings).
"""

from __future__ import annotations

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

    import pyhgt_tpu.ops.sorted_hgt as sh
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    results = {}

    def measure(tag, weighted, fused_opt=False, **overrides):
        sh.WEIGHTED_KERNEL = weighted
        fl = build_flagship(preset, **overrides)
        batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
        se = fl.sort(batch)
        params = fl.init_params(jax.random.key(0), batch, se)
        tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                            clip_norm=0.25, params=params, fused=fused_opt)
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
        results[tag] = dt * 1e3
        print(f"{tag}: {dt*1e3:.1f} ms/step", flush=True)

    def measure_acc(tag, weighted, n_acc=2, fused_opt=False, **overrides):
        """Per-microbatch time of the grad-accumulation step: n_acc distinct
        batches per jit call, one optimizer apply (amortizes the optimizer
        + the ~0.78 ms dispatch floor)."""
        from pyhgt_tpu.train.step import make_train_step_acc

        sh.WEIGHTED_KERNEL = weighted
        fl = build_flagship(preset, **overrides)
        batches = [synth_flagship_batch(fl, seed=i, edge_fill=1.0)
                   for i in range(n_acc)]
        ses = [fl.sort(b) for b, _ in batches]
        params = fl.init_params(jax.random.key(0), batches[0][0], ses[0])
        tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                            clip_norm=0.25, params=params, fused=fused_opt)
        state = TrainState.create(params, tx)
        step = make_train_step_acc(fl.loss_fn_single(), tx)
        bargs = tuple(
            jax.device_put(np.stack([np.asarray(a) for a in args]))
            for args in zip(*(fl.batch_args(b) for b, _ in batches))
        )
        se_d = jax.device_put(
            jax.tree.map(lambda *xs: np.stack(xs), *ses))
        y = jax.device_put(np.stack([np.asarray(l) for _, l in batches]))
        rng = jax.random.key(1)
        for _ in range(3):
            state, loss = step(state, rng, *bargs, se_d, y)
        float(loss)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, loss = step(state, rng, *bargs, se_d, y)
        lval = float(loss)
        dt = (time.perf_counter() - t0) / n / n_acc
        assert np.isfinite(lval), lval
        results[tag] = dt * 1e3
        print(f"{tag}: {dt*1e3:.1f} ms/microbatch (x{n_acc})", flush=True)

    measure("baseline (weighted off)", False)
    measure("weighted kernel ON", True)
    best_weighted = results["weighted kernel ON"] < results[
        "baseline (weighted off)"]
    measure("recompute bwd (weighted best)", best_weighted,
            edge_bwd="recompute")
    measure("src_direct bwd (weighted best)", best_weighted,
            edge_bwd="src_direct")
    measure("softmax_pallas (weighted best)", best_weighted,
            softmax_pallas=True)
    measure("fused adamw (weighted best)", best_weighted, fused_opt=True)
    measure("param_bf16 (weighted best)", best_weighted, param_bf16=True)

    # combined-best: every knob that beat the baseline, together (knob
    # effects were isolated above; interactions are real — measure)
    base = results["weighted kernel ON" if best_weighted
                   else "baseline (weighted off)"]
    combo = {}
    if results["fused adamw (weighted best)"] < base:
        combo["fused_opt"] = True
    if results["param_bf16 (weighted best)"] < base:
        combo["param_bf16"] = True
    fused = combo.pop("fused_opt", False)
    measure("COMBINED best", best_weighted, fused_opt=fused, **combo)
    measure_acc("acc2 (combined best)", best_weighted, n_acc=2,
                fused_opt=fused, **combo)

    print("RESULTS", results, flush=True)
    import json
    with open("/tmp/bench_ab_round2_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print("verdict: flip WEIGHTED_KERNEL ->", best_weighted, flush=True)
    best_base = results["weighted kernel ON" if best_weighted
                        else "baseline (weighted off)"]
    print("verdict: fused_opt saves",
          round(best_base - results["fused adamw (weighted best)"], 1),
          "ms; param_bf16 saves",
          round(best_base - results["param_bf16 (weighted best)"], 1),
          "ms (both vs the weighted-best baseline, isolating each knob)",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
