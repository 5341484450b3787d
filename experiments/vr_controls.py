"""VR-inversion root-cause controls (round-5, VERDICT r4 item #1).

Round-3/4 proxy artifacts showed variance-reduce eval "losing" ~2.4 pts
to a number labelled ``single_sample_acc`` — but that number was a
PER-OCCURRENCE running average over every live row (seed + periphery
context, each appearance weighted equally), not the reference's
sequential protocol (one resample per batch, per-node accumulate, final
argmax — ``/root/reference/ogbn-mag/eval_ogbn_mag.py:163-191``). This
script evaluates the round-4 checkpoint on the 42.2M-edge proxy with the
round-5 evaluator, which derives all controls from one pass:

  acc            VR per-node accuracy (vr_num resamples, reference :182-191)
  seq_acc        sequential per-node accuracy (resample 0 only)
  vr_curve       per-node accuracy after k = 1..vr_num resamples
  seed_vr/seq    both protocols restricted to seed-context predictions
  seed/peri_occ  per-occurrence accuracy split by context
  seed_agreement resample diversity of per-seed predictions
  resample_dup   correlated-resample detector

Run after the round-4 proxy (graph + checkpoint in /tmp/ogbn_mag_proxy):
  python experiments/vr_controls.py [--max_eval_nodes 2048] [--cpu]
Writes docs/runs/vr_controls_r5.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dir", default="/tmp/ogbn_mag_proxy")
    ap.add_argument("--graph", default=None, help="graph dir (default <dir>/graph_1.0)")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default <dir>/ogbn_mag_proxy_hgt)")
    ap.add_argument("--max_eval_nodes", type=int, default=2048,
                    help="0 = no subsampling: seed EVERY split node (the "
                         "reference's full protocol; no periphery-only "
                         "population)")
    ap.add_argument("--vr_num", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--out", default="docs/runs/vr_controls_r5.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.experiments.engine import evaluate_ogbn
    from pyhgt_tpu.graph.csr import CSRGraph

    gdir = args.graph or os.path.join(args.dir, "graph_1.0")
    ckpt = args.ckpt or os.path.join(args.dir, "ogbn_mag_proxy_hgt")
    graph = CSRGraph.load_dir(gdir, mmap=True)
    print(f"graph: {graph}", flush=True)

    # the round-4 proxy training config (examples/ogbn_mag_scale_proxy.py)
    cfg = ExperimentConfig(
        task_name="vr_controls", model_dir=args.dir,
        n_hid=512, n_heads=8, n_layers=4,
        prev_norm=True, last_norm=True, use_rte=True,
        sample_depth=6, sample_width=520,
        batch_size=args.batch_size, vr_num=args.vr_num,
        save_kv=True, calibrate_caps=True,
        edge_bf16=True, seg_pallas=True,
    )
    t0 = time.time()
    out = evaluate_ogbn(cfg, graph, ckpt, eval_mode="variance_reduce",
                        max_eval_nodes=args.max_eval_nodes or None)
    out["wall_s"] = round(time.time() - t0, 1)
    out["max_eval_nodes"] = args.max_eval_nodes
    out["vr_num"] = args.vr_num
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("RESULT " + json.dumps(out, default=float), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
