"""Multi-chip day-one scaling sweep (VERDICT r3 #8).

Pointed at an N-chip slice, unattended, this measures everything TODO's
"when hardware arrives" item needs, writing one JSON line per point to
``docs/runs/bench_scaling.jsonl`` (or ``--out``):

- dp edges/s at 1, 2, 4, ..., N chips (scaling efficiency vs the
  BASELINE.md >=80% target — one independent subgraph per chip);
- gp edges/s at 1..N (ONE batch's edges partitioned; efficiency = speedup
  of the same batch), with a gp_overlap (chunked-ppermute ring) vs psum
  A/B at each width — the question real ICI answers;
- pp step time vs n_micro at each stage count (bubble fraction
  (S-1)/(S-1+M) vs measured; per-microbatch fixed cost from the slope).

Dry-runs on the 8-device virtual CPU mesh (``--cpu``): tiny preset,
1 timing step — validates every code path this script will take on real
hardware, so hardware day is a measurement, not development.

Usage:
    python experiments/bench_scaling.py                 # real chips
    python experiments/bench_scaling.py --cpu           # virtual 8-dev mesh
    python experiments/bench_scaling.py --modes dp,gp   # subset
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _sizes(n: int):
    s, out = 1, []
    while s <= n:
        out.append(s)
        s *= 2
    if out[-1] != n:
        out.append(n)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="virtual 8-device CPU mesh dry run (tiny preset)")
    ap.add_argument("--preset", default=None)
    ap.add_argument("--modes", default="dp,gp,pp")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--warmup", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    preset = args.preset or ("dryrun" if args.cpu else "bench")
    steps = args.steps or (1 if args.cpu else 10)
    warmup = args.warmup or (1 if args.cpu else 3)
    out_path = args.out or os.path.join(
        os.path.dirname(__file__), "..", "docs", "runs",
        "bench_scaling_cpu.jsonl" if args.cpu else "bench_scaling.jsonl",
    )
    devices = jax.devices()
    N = len(devices)
    modes = args.modes.split(",")
    rows = []

    def emit(**row):
        row["preset"] = preset
        row["n_devices_avail"] = N
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def timeit(step, state, rng, bargs, se_d, y):
        for _ in range(warmup):
            state, loss = step(state, rng, *bargs, se_d, y)
        float(loss)  # hard sync (block_until_ready lies on axon)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, rng, *bargs, se_d, y)
        lval = float(loss)
        assert np.isfinite(lval), lval
        return (time.perf_counter() - t0) / steps

    fl = build_flagship(preset)
    n_layers = fl.cfg.n_layers
    base_eps = {}

    # ---------------------------------------------------------------- dp
    if "dp" in modes:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pyhgt_tpu.parallel.mesh import make_mesh, replicate
        from pyhgt_tpu.parallel.spmd import make_dp_train_step

        for n in _sizes(N):
            batches, ys, ses = [], [], []
            for i in range(n):
                b, y_ = synth_flagship_batch(fl, seed=i, edge_fill=1.0)
                batches.append(b)
                ys.append(y_)
                ses.append(fl.sort(b))
            n_edges = sum(int(np.asarray(b.edge_mask).sum())
                          for b in batches)
            params = fl.init_params(jax.random.key(0), batches[0], ses[0])
            tx = make_optimizer(cosine_schedule(1e-3, 1000),
                                weight_decay=0.01, clip_norm=0.25,
                                params=params)
            if n == 1:
                state = TrainState.create(params, tx)
                step = make_train_step(fl.loss_fn_single(), tx)
                bargs = tuple(jax.device_put(np.asarray(a))
                              for a in fl.batch_args(batches[0]))
                se_d = jax.device_put(ses[0])
                y = jax.device_put(np.asarray(ys[0]))
            else:
                mesh = make_mesh(n_data=n, n_model=1, devices=devices[:n])
                bs = NamedSharding(mesh, P("data"))
                stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
                bargs = tuple(jax.device_put(np.asarray(a), bs)
                              for a in fl.batch_args(stack))
                se_d = jax.device_put(
                    jax.tree.map(lambda *xs: np.stack(xs), *ses), bs)
                y = jax.device_put(np.stack(ys), bs)
                state = TrainState.create(
                    jax.device_put(params, replicate(mesh)), tx)
                step = make_dp_train_step(fl.loss_fn_single(), tx, mesh)
            dt = timeit(step, state, jax.random.key(1), bargs, se_d, y)
            eps = n_edges * n_layers / dt
            base_eps.setdefault("dp1", eps if n == 1 else None)
            eff = (eps / (base_eps["dp1"] * n)
                   if base_eps.get("dp1") else None)
            emit(mode="dp", n=n, ms=round(dt * 1e3, 2),
                 medges_s=round(eps / 1e6, 3),
                 efficiency=round(eff, 3) if eff else None)

    # ---------------------------------------------------------------- gp
    if "gp" in modes:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pyhgt_tpu.parallel.edge_partition import partition_sorted
        from pyhgt_tpu.parallel.mesh import make_mesh, replicate
        from pyhgt_tpu.parallel.spmd import make_gp_train_step

        batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
        n_edges = int(np.asarray(batch.edge_mask).sum())
        gp1_eps = None
        for n in _sizes(N):
            for overlap in ([False] if n == 1 else [False, True]):
                flg = build_flagship(preset, graph_axis="graph",
                                     gp_overlap=overlap)
                se = flg.sort(batch)
                params = flg.init_params(jax.random.key(0), batch, se)
                tx = make_optimizer(cosine_schedule(1e-3, 1000),
                                    weight_decay=0.01, clip_norm=0.25,
                                    params=params)
                mesh = make_mesh(n_data=1, n_model=1, n_graph=n,
                                 devices=devices[:n])
                pe = partition_sorted(
                    se, n, num_blocks=len(flg.layout.blocks),
                    node_cap=flg.layout.node_cap,
                    num_nodes_flat=flg.layout.num_types
                    * flg.layout.node_cap)
                gsh = NamedSharding(mesh, P("graph"))
                bargs = tuple(jax.device_put(np.asarray(a), replicate(mesh))
                              for a in flg.batch_args(batch))
                se_d = jax.device_put(pe, gsh)
                y = jax.device_put(np.asarray(labels), replicate(mesh))
                state = TrainState.create(
                    jax.device_put(params, replicate(mesh)), tx)
                step = make_gp_train_step(flg.loss_fn_single(), tx, mesh)
                dt = timeit(step, state, jax.random.key(1), bargs, se_d, y)
                eps = n_edges * n_layers / dt
                if n == 1:
                    gp1_eps = eps
                emit(mode="gp", n=n, overlap=overlap,
                     ms=round(dt * 1e3, 2), medges_s=round(eps / 1e6, 3),
                     speedup=round(eps / gp1_eps, 3) if gp1_eps else None,
                     efficiency=(round(eps / (gp1_eps * n), 3)
                                 if gp1_eps else None))

    # ---------------------------------------------------------------- pp
    if "pp" in modes:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pyhgt_tpu.parallel.pipeline import (
            make_pipe_mesh,
            make_pp_train_step,
            pipeline_param_shardings,
            stack_pipeline_params,
        )

        for n in [s for s in _sizes(N) if s > 1 and fl.cfg.n_layers % s == 0]:
            for n_micro in (n, 2 * n, 4 * n):
                batches, ys, ses = [], [], []
                for i in range(n_micro):
                    b, y_ = synth_flagship_batch(fl, seed=i, edge_fill=1.0)
                    batches.append(b)
                    ys.append(y_)
                    ses.append(fl.sort(b))
                n_edges = sum(int(np.asarray(b.edge_mask).sum())
                              for b in batches)
                stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
                params = fl.init_params(jax.random.key(0), batches[0],
                                        ses[0])
                pp_params = stack_pipeline_params(params, fl.cfg.n_layers,
                                                  n)
                tx = make_optimizer(cosine_schedule(1e-3, 1000),
                                    weight_decay=0.01, clip_norm=0.25,
                                    params=pp_params)
                mesh = make_pipe_mesh(n)
                rep = NamedSharding(mesh, P())
                state = TrainState.create(
                    jax.device_put(pp_params,
                                   pipeline_param_shardings(pp_params,
                                                            mesh)), tx)
                micro = tuple(jax.device_put(np.asarray(a), rep)
                              for a in fl.batch_args(stack))
                se_d = jax.device_put(
                    jax.tree.map(lambda *xs: np.stack(xs), *ses), rep)
                y = jax.device_put(np.stack(ys), rep)
                step = make_pp_train_step(fl, tx, mesh, n_micro=n_micro)
                dt = timeit(step, state, jax.random.key(1), (micro,),
                            se_d, y)
                eps = n_edges * n_layers / dt
                bubble = (n - 1) / (n - 1 + n_micro)
                emit(mode="pp", n=n, n_micro=n_micro,
                     ms=round(dt * 1e3, 2), medges_s=round(eps / 1e6, 3),
                     analytic_bubble=round(bubble, 3))

    print("DONE", len(rows), "points ->", out_path, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
