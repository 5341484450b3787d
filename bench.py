"""Benchmark harness — edges/s/chip on the flagship HGT train step.

Runs the full jit-compiled training step (forward + backward + AdamW) on an
ogbn-mag-reproduction-scale batch (4-layer HGT, n_hid 512, 8 heads, RTE —
``/root/reference/ogbn-mag/README.md:16-24``) and reports edges processed
per second per chip (valid edges × n_layers / step time).

The reference publishes no throughput numbers (SURVEY.md §6); the
``vs_baseline`` field is relative to this repo's round-1 measurement
(BASELINE_EDGES_PER_S below) so later rounds show the speedup trend.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Round-1 pinned measurement on one v5e chip (2026-08-17, scatter-free
# sorted path + tiled reductions + save_kv: 379.8 ms/step on 226304 edges
# x 4 layers). vs_baseline tracks speedup against this number.
BASELINE_EDGES_PER_S = 2_383_560.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="bench")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--dp", type=int, default=1,
                    help="data-parallel shards (requires that many devices; "
                         "the shard_map'd unbatched program per device)")
    ap.add_argument("--gp", type=int, default=1,
                    help="graph-axis (edge-partition) shards: ONE batch's "
                         "sorted edges split contiguously across devices, "
                         "boundary stats psum per layer (the SP analogue)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline stages: the conv stack split over a "
                         "'pipe' mesh, GPipe microbatch schedule "
                         "(parallel/pipeline.py); needs n_layers %% pp == 0")
    ap.add_argument("--pp_micro", type=int, default=0,
                    help="pp microbatches per step (default 2*pp)")
    ap.add_argument("--edge_bf16", action="store_true", default=None,
                    help="mixed-precision per-edge stage (bf16 values, "
                         "f32 softmax/accumulation)")
    ap.add_argument("--no-edge_bf16", dest="edge_bf16", action="store_false")
    ap.add_argument("--edge_bwd", choices=["permute", "recompute", "src_direct"],
                    default=None, help="sorted-path backward strategy")
    ap.add_argument("--seg_pallas", action="store_true", default=None,
                    help="Pallas segment-sum kernel for the wide [E, D] "
                         "reductions (ops/pallas_seg)")
    ap.add_argument("--no-seg_pallas", dest="seg_pallas",
                    action="store_false")
    ap.add_argument("--fused_opt", action="store_true", default=False,
                    help="flattened-vector AdamW (train/optim.fused_adamw)")
    ap.add_argument("--param_bf16", action="store_true", default=None,
                    help="bf16 weight banks at apply time, f32 masters")
    ap.add_argument("--softmax_pallas", action="store_true", default=None,
                    help="fused online-softmax Pallas kernel (experimental)")
    ap.add_argument("--no-probe", dest="probe", action="store_false",
                    default=True,
                    help="skip the bounded device-reachability probe")
    ap.add_argument("--probe_timeout", type=int, default=420)
    ap.add_argument("--probe_retries", type=int, default=8,
                    help="extra probe attempts (sleep between them) before "
                         "giving up — the tunnel flaps (a 2h+ hard outage "
                         "observed 2026-08-20); the driver runs bench ONCE "
                         "per round, so ride out long outages (~1h45 "
                         "worst-case at these defaults)")
    ap.add_argument("--probe_retry_sleep", type=int, default=300)
    args = ap.parse_args()

    if args.probe:
        # the axon tunnel can die for hours and then HANGS on any device
        # op (observed 2026-08-18, >8 h outage) — probe in a bounded
        # subprocess, retry through short flaps, and fail fast with a
        # clear error instead of wedging the harness
        import subprocess

        last_err = None
        for attempt in range(1 + max(args.probe_retries, 0)):
            if attempt:
                time.sleep(args.probe_retry_sleep)
            try:
                subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp; "
                     "print(float(jax.jit(lambda a: a + 1)"
                     "(jnp.ones((8, 128)))[0, 0]))"],
                    timeout=args.probe_timeout, check=True,
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                )
                last_err = None
                break
            except subprocess.TimeoutExpired:
                last_err = (f"device unreachable (trivial jit did not "
                            f"complete in {args.probe_timeout}s — tunnel "
                            f"down?)")
            except subprocess.CalledProcessError as e:
                last_err = f"device probe failed: {e}"
            print(f"probe attempt {attempt + 1} failed: {last_err}",
                  file=sys.stderr)
        if last_err is not None:
            print(f"ERROR: {last_err}", file=sys.stderr)
            return 2

    import jax

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    overrides = {}
    if args.edge_bf16 is not None:
        overrides["edge_bf16"] = args.edge_bf16
    if args.edge_bwd is not None:
        overrides["edge_bwd"] = args.edge_bwd
    if args.seg_pallas is not None:
        overrides["seg_pallas"] = args.seg_pallas
    if args.softmax_pallas is not None:
        overrides["softmax_pallas"] = args.softmax_pallas
    if args.param_bf16 is not None:
        overrides["param_bf16"] = args.param_bf16
    if sum(x > 1 for x in (args.dp, args.gp, args.pp)) > 1:
        ap.error("--dp/--gp compose via the engine (cfg.dp x cfg.gp); "
                 "bench measures one parallel mode at a time")
    if args.gp > 1:
        overrides["graph_axis"] = "graph"
    fl = build_flagship(args.preset, **overrides)
    batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se)
    tx = make_optimizer(
        cosine_schedule(1e-3, 1000), weight_decay=0.01, clip_norm=0.25,
        params=params, fused=args.fused_opt,
    )
    state = TrainState.create(params, tx)
    rng = jax.random.key(1)
    n_edges = int(np.sum(np.asarray(batch.edge_mask)))
    n_layers = fl.cfg.n_layers

    if args.dp > 1:
        # dp scaling mode: one subgraph per device, shard_map'd unbatched
        # program, grads psum over ICI (parallel/spmd.py)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pyhgt_tpu.parallel.mesh import make_mesh, replicate
        from pyhgt_tpu.parallel.spmd import make_dp_train_step

        mesh = make_mesh(n_data=args.dp, n_model=1,
                         devices=jax.devices()[: args.dp])
        bs = NamedSharding(mesh, P("data"))
        batches, ys, ses = [batch], [labels], [se]
        for i in range(1, args.dp):
            b, y = synth_flagship_batch(fl, seed=i, edge_fill=1.0)
            batches.append(b)
            ys.append(y)
            ses.append(fl.sort(b))
        import jax.tree_util  # noqa: F401

        stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        bargs = tuple(jax.device_put(np.asarray(a), bs)
                      for a in fl.batch_args(stack))
        se_stack = jax.device_put(
            jax.tree.map(lambda *xs: np.stack(xs), *ses), bs
        )
        y = jax.device_put(np.stack(ys), bs)
        state = TrainState.create(
            jax.device_put(params, replicate(mesh)), tx
        )
        step = make_dp_train_step(fl.loss_fn_single(), tx, mesh)
        n_edges *= args.dp
    elif args.gp > 1:
        # graph-axis scaling mode: the SAME batch's edges split across
        # devices (parallel/edge_partition.py); throughput counts the one
        # batch against wall time — scaling efficiency = vs 1-chip step
        from pyhgt_tpu.parallel.edge_partition import partition_sorted
        from pyhgt_tpu.parallel.mesh import make_mesh, replicate
        from pyhgt_tpu.parallel.spmd import make_gp_train_step

        mesh = make_mesh(n_data=1, n_model=1, n_graph=args.gp,
                         devices=jax.devices()[: args.gp])
        pe = partition_sorted(
            se, args.gp, num_blocks=len(fl.layout.blocks),
            node_cap=fl.layout.node_cap,
            num_nodes_flat=fl.layout.num_types * fl.layout.node_cap,
            pk=fl.cfg.seg_tile or None, pw=fl.cfg.seg_w or None,
            # per-shard production preset (round-5): compaction + rank
            # cap now apply under gp, so gp measures the real program
            tgt_rank_cap=fl.cfg.seg_rank_cap, tab_cap=fl.cfg.tab_cap,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        gsh = NamedSharding(mesh, P("graph"))
        bargs = tuple(
            jax.device_put(np.asarray(a), replicate(mesh))
            for a in fl.batch_args(batch)
        )
        se_stack = jax.device_put(pe, gsh)
        y = jax.device_put(np.asarray(labels), replicate(mesh))
        state = TrainState.create(
            jax.device_put(params, replicate(mesh)), tx
        )
        step = make_gp_train_step(fl.loss_fn_single(), tx, mesh)
    elif args.pp > 1:
        # pipeline mode: conv stack staged over 'pipe', GPipe microbatch
        # schedule; throughput counts all microbatches against wall time
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pyhgt_tpu.parallel.pipeline import (
            make_pipe_mesh,
            make_pp_train_step,
            pipeline_param_shardings,
            stack_pipeline_params,
        )
        from pyhgt_tpu.train.optim import cosine_schedule as _cs

        n_micro = args.pp_micro or 2 * args.pp
        mesh = make_pipe_mesh(args.pp)
        batches, ys, ses = [batch], [labels], [se]
        for i in range(1, n_micro):
            b, y_ = synth_flagship_batch(fl, seed=i, edge_fill=1.0)
            batches.append(b)
            ys.append(y_)
            ses.append(fl.sort(b))
        stack = jax.tree.map(lambda *xs: np.stack(xs), *batches)
        pp_params = stack_pipeline_params(params, fl.cfg.n_layers, args.pp)
        tx = make_optimizer(
            _cs(1e-3, 1000), weight_decay=0.01, clip_norm=0.25,
            params=pp_params, fused=args.fused_opt,
        )
        rep = NamedSharding(mesh, P())
        state = TrainState.create(
            jax.device_put(
                pp_params, pipeline_param_shardings(pp_params, mesh)
            ),
            tx,
        )
        micro = tuple(jax.device_put(np.asarray(a), rep)
                      for a in fl.batch_args(stack))
        bargs = (micro,)
        se_stack = jax.device_put(
            jax.tree.map(lambda *xs: np.stack(xs), *ses), rep
        )
        y = jax.device_put(np.stack(ys), rep)
        step = make_pp_train_step(fl, tx, mesh, n_micro=n_micro)
        n_edges *= n_micro
    else:
        # unbatched step: vmap(1) turns edge gathers into batched gathers
        # and costs ~20% (measured 380 -> 304 ms)
        step = make_train_step(fl.loss_fn_single(), tx)
        bargs = tuple(
            jax.device_put(np.asarray(a)) for a in fl.batch_args(batch)
        )
        se_stack = jax.device_put(se)
        y = jax.device_put(np.asarray(labels))

    for _ in range(args.warmup):
        state, loss = step(state, rng, *bargs, se_stack, y)
    float(loss)  # hard host sync (block_until_ready is unreliable on the
    # tunneled axon platform: it returned before execution finished)

    # roofline model (VERDICT r2 #7): speed-of-light step time =
    # max(FLOPs / MXU_peak, HBM bytes / HBM_bw); roofline_frac is the
    # achieved fraction of it. v5e: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
    #
    # FLOPs come from XLA's cost analysis of the compiled step (includes
    # the Pallas kernels via their CostEstimates; counts f32 and bf16
    # alike — a mild overestimate of the MXU bound). Bytes do NOT: XLA's
    # "bytes accessed" counts op-level logical traffic including
    # fusion-internal re-reads (170 GB at bench scale — more than the
    # chip can physically move in the measured step). Instead an analytic
    # FLOOR of certain HBM traffic is used, from the algorithm structure
    # (docs/PERF_NOTES.md / DESIGN.md): per layer ~18 wide [E, D] bf16
    # passes (fwd: save_kv writes + weighted-message write/read; bwd:
    # product writes, src permute read+write pairs, pair/tab kernel
    # reads, g_q_n weighted chain) + ~6 physical narrow passes ([E, 8]
    # lane-pads to 128) + the AdamW param/moment traffic. Both bounds
    # being floors, roofline_frac is a defensible LOWER bound on how
    # close the step runs to physics.
    roofline = None
    if args.dp == args.gp == args.pp == 1:
        try:
            compiled = step.lower(state, rng, *bargs, se_stack, y).compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
        except Exception:
            flops = 0.0
        E_pad = int(np.asarray(se.edge_tgt).shape[0])
        D = fl.cfg.n_hid
        L = fl.cfg.n_layers
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(state.params)
        )
        wide = E_pad * D * 2           # one [E, D] bf16 HBM pass
        narrow = E_pad * 128 * 4       # one [E, 8] f32 pass (lane-padded)
        bytes_floor = (
            L * (18 * wide + 6 * narrow)
            + 6 * n_params * 4         # AdamW: read+write of p, mu, nu
        )
        if flops > 0:
            sol = max(flops / 1.97e14, bytes_floor / 819e9)
            # measured stream ceiling (round-5, experiments/stream_probe
            # .py on this chip): a pure bf16 [E, D] copy achieves
            # 440 GB/s, not the 819 GB/s spec — the spec-denominator
            # frac is kept for cross-round continuity, the measured one
            # is the honest bound (docs/PERF_NOTES.md round-5)
            sol_meas = max(flops / 1.97e14, bytes_floor / 440e9)
            roofline = dict(flops=flops, bytes=bytes_floor, sol_s=sol,
                            sol_meas_s=sol_meas)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, rng, *bargs, se_stack, y)
    lval = float(loss)  # sync on the value, not block_until_ready
    dt = (time.perf_counter() - t0) / args.steps

    assert np.isfinite(lval), f"non-finite loss {lval}"
    edges_per_s = n_edges * n_layers / dt / args.dp / args.gp / args.pp
    vs = edges_per_s / BASELINE_EDGES_PER_S if BASELINE_EDGES_PER_S else 1.0
    out = {
        "metric": "hgt_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": f"edges/s/chip ({n_layers}-layer fwd+bwd+adamw, "
                f"{n_edges} edges/batch, step {dt*1e3:.1f} ms"
                + (f", dp={args.dp}" if args.dp > 1 else "")
                + (f", gp={args.gp}" if args.gp > 1 else "")
                + (f", pp={args.pp}" if args.pp > 1 else "") + ")",
        "vs_baseline": round(vs, 3),
    }
    if roofline is not None:
        out["roofline_frac"] = round(roofline["sol_s"] / dt, 3)
        out["roofline_frac_measured"] = round(
            roofline["sol_meas_s"] / dt, 3)
        out["unit"] += (
            f" [SoL {roofline['sol_s']*1e3:.1f} ms: "
            f"{roofline['flops']/1e12:.1f} TFLOP @197T, "
            f"{roofline['bytes']/1e9:.1f} GB @819GB/s; "
            f"measured-stream SoL {roofline['sol_meas_s']*1e3:.1f} ms "
            f"@440GB/s]"
        )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    import sys as _sys

    _sys.exit(main() or 0)
