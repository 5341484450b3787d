"""Paired framework head-to-head AT THE FULL 42M-EDGE PROXY SCALE.

The synthetic head-to-heads (head_to_head*.json) pair the frameworks on
a 3.2k-paper graph; this drives the same paired protocol — matched
init, identical recipe, byte-identical task batches through the shared
sampling pipeline — on the full ogbn-mag-shaped proxy
(examples/ogbn_mag_scale_proxy.py: 736k papers / 42.2M edges / 349
classes), i.e. at the scale of the reference's published 0.5007
(``/root/reference/ogbn-mag/README.md:26-30``). Per-step model cost is
scale-independent (batches are cap-bounded), so the torch arm is
CPU-affordable; ours runs on the chip when available.

Eval: seed-paired VR/sequential accuracies (the reference-comparable
pair under subsampled eval — docs/runs/vr_inversion_memo.md).

Usage: python experiments/proxy_head_to_head.py [--seeds 3 --epochs 2]
Writes docs/runs/proxy_head_to_head_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run OUR arm on CPU too (torch is CPU anyway)")
    ap.add_argument("--graph", default="/tmp/ogbn_mag_proxy/graph_1.0")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--max_eval_nodes", type=int, default=1024)
    ap.add_argument("--vr_num", type=int, default=4)
    ap.add_argument("--out", default="docs/runs/proxy_head_to_head_r5.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from torch_head_to_head import train_torch

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.experiments import run_ogbn
    from pyhgt_tpu.graph.csr import CSRGraph

    graph = CSRGraph.load_dir(args.graph, mmap=True)
    print(f"graph: {graph}", flush=True)

    rows = []
    for seed in range(args.seeds):
        cfg = ExperimentConfig(
            task_name=f"pxh2h_{seed}", model_dir=f"/tmp/pxh2h_{seed}",
            n_hid=512, n_heads=8, n_layers=4,
            prev_norm=True, last_norm=True, use_rte=True,
            sample_depth=6, sample_width=520,
            batch_size=128, n_batch=16, repeat=2,
            scheduler="onecycle", max_lr=5e-4, clip=1.0,
            n_epoch=args.epochs, vr_num=args.vr_num,
            save_kv=True, calibrate_caps=True,
            edge_bf16=True, seg_pallas=True,
            seed=43 + seed,
        )
        t0 = time.time()
        ours = run_ogbn(cfg, graph, log=lambda s: None,
                        max_eval_nodes=args.max_eval_nodes)
        t = ours["test"]
        row = dict(framework="pyhgt_tpu", seed=seed,
                   best_valid=ours["best_valid"],
                   seed_vr_acc=t["seed_vr_acc"],
                   seed_seq_acc=t["seed_seq_acc"],
                   acc=t["acc"], seq_acc=t["seq_acc"],
                   secs=round(time.time() - t0, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)

        t0 = time.time()
        theirs = train_torch(graph, cfg, seed=43 + seed,
                             log=lambda s: None, init="matched",
                             max_eval_nodes=args.max_eval_nodes)
        row = dict(framework="torch_reference_matched_init", seed=seed,
                   best_valid=theirs.get("valid"),
                   seed_vr_acc=theirs.get("seed_vr_acc"),
                   seed_seq_acc=theirs.get("seed_seq_acc"),
                   acc=theirs.get("acc"), seq_acc=theirs.get("seq_acc"),
                   secs=round(time.time() - t0, 1))
        rows.append(row)
        print(json.dumps(row), flush=True)
        _write(rows, args)
    _write(rows, args)
    return 0


def _write(rows, args):
    summary = dict(metric="proxy_head_to_head_seed_vr_acc",
                   epochs=args.epochs, seeds=args.seeds,
                   max_eval_nodes=args.max_eval_nodes, vr_num=args.vr_num)
    for fw in sorted({r["framework"] for r in rows}):
        v = [r["seed_vr_acc"] for r in rows
             if r["framework"] == fw and r["seed_vr_acc"] is not None]
        if v:
            summary[fw + "_seed_vr_mean"] = round(float(np.mean(v)), 4)
            summary[fw + "_n"] = len(v)
    ours = {r["seed"]: r["seed_vr_acc"] for r in rows
            if r["framework"] == "pyhgt_tpu"}
    torch_m = {r["seed"]: r["seed_vr_acc"] for r in rows
               if r["framework"] == "torch_reference_matched_init"}
    common = sorted(set(ours) & set(torch_m))
    if len(common) >= 2:
        deltas = np.array([ours[s] - torch_m[s] for s in common])
        summary["paired_delta_mean"] = round(float(deltas.mean()), 4)
        summary["paired_delta_std"] = round(float(deltas.std(ddof=1)), 4)
        summary["n_pairs"] = len(common)
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rows": rows}, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    sys.exit(main())
