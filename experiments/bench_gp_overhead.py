"""Single-chip cost of the edge-partitioned (gp) step — VERDICT r2 #6.

Scaling *efficiency* needs real multi-chip hardware (unavailable: one
tunneled v5e), but the partitioned program's single-chip overhead does
not: run the SAME bench workload through (a) the production unbatched
step and (b) the gp step on a 1-device 'graph' mesh (collectives over a
1-member axis are no-ops, so the difference is purely the partitioned
formulation: CSR cumsum-diff reductions instead of the Pallas
live-partials kernels, f32 edge stage, per-shard aux).

Usage: python experiments/bench_gp_overhead.py [--cpu]
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

    def run(tag, step, state, args_):
        rng = jax.random.key(1)
        for _ in range(3):
            state, loss = step(state, rng, *args_)
        float(loss)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, loss = step(state, rng, *args_)
        lval = float(loss)
        dt = (time.perf_counter() - t0) / n
        assert np.isfinite(lval), lval
        results[tag] = round(dt * 1e3, 2)
        print(f"{tag}: {dt*1e3:.1f} ms/step", flush=True)

    # (a) production unbatched step
    fl = build_flagship(preset)
    batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se)
    tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                        clip_norm=0.25, params=params)
    state = TrainState.create(params, tx)
    step = make_train_step(fl.loss_fn_single(), tx)
    bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
    run("unbatched (production)", step, state,
        bargs + (jax.device_put(se), jax.device_put(np.asarray(labels))))

    # (b) the gp step on a 1-device 'graph' mesh
    from pyhgt_tpu.parallel.edge_partition import partition_sorted
    from pyhgt_tpu.parallel.mesh import make_mesh, replicate
    from pyhgt_tpu.parallel.spmd import make_gp_train_step

    for overlap in (False,):  # overlap is an identity at P=1 (ring skips)
        fl_g = build_flagship(preset, graph_axis="graph", gp_overlap=overlap)
        se_g = fl_g.sort(batch)
        pe = partition_sorted(
            se_g, 1, num_blocks=len(fl_g.layout.blocks),
            node_cap=fl_g.layout.node_cap,
            num_nodes_flat=fl_g.layout.num_types * fl_g.layout.node_cap,
            pk=fl_g.cfg.seg_tile or None, pw=fl_g.cfg.seg_w or None,
            # round-5: the FULL production preset applies per shard
            tgt_rank_cap=fl_g.cfg.seg_rank_cap, tab_cap=fl_g.cfg.tab_cap,
        )
        mesh = make_mesh(n_data=1, n_model=1, n_graph=1,
                         devices=jax.devices()[:1])
        params_g = fl_g.init_params(jax.random.key(0), batch, se_g)
        tx_g = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                              clip_norm=0.25, params=params_g)
        state_g = TrainState.create(
            jax.device_put(params_g, replicate(mesh)), tx_g)
        step_g = make_gp_train_step(fl_g.loss_fn_single(), tx_g, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as Ps

        gsh = NamedSharding(mesh, Ps("graph"))
        bargs_g = tuple(jax.device_put(np.asarray(a), replicate(mesh))
                        for a in fl_g.batch_args(batch))
        run(f"gp=1 partitioned (overlap={overlap})", step_g, state_g,
            bargs_g + (jax.device_put(pe, gsh),
                       jax.device_put(np.asarray(labels), replicate(mesh))))
        if not overlap:
            results["gp1_overhead_ms"] = round(
                results[f"gp=1 partitioned (overlap={overlap})"]
                - results["unbatched (production)"], 2)

    print("RESULTS", json.dumps(results), flush=True)
    with open("/tmp/bench_gp_overhead.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
