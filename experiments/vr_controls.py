"""VR eval controls + the sharded full-protocol runner (round-5).

Round-5 root-cause work (docs/runs/vr_inversion_memo.md) showed the
r3/r4 "VR inversion" was a metric artifact; this script evaluates a
trained proxy checkpoint with the round-5 evaluator, which derives VR /
sequential / seed-paired / occurrence stats from one pass.

FULL PROTOCOL MODE (``--max_eval_nodes 0``): seed EVERY split node (the
reference's protocol — no periphery-only population). That is ~4.6k
sample+forward iterations at full proxy scale, and the axon TPU plugin
leaks host memory on every device transfer (~28 MB/iteration, measured:
experiments/axon_leak_probe.py) — a single process OOMs at ~130 GB.
``--shards N`` therefore splits the seed list across N sequential
SUBPROCESSES; each returns its compact per-split-node accumulators
(disjoint seeds), and the parent merges them EXACTLY (scores sum, seen
masks OR, counters add). ``--prefetch K`` overlaps host sampling with
the device forward inside each shard.

Run after a proxy training run (graph + checkpoint dirs):
  python experiments/vr_controls.py [--max_eval_nodes 2048] [--cpu]
  python experiments/vr_controls.py --max_eval_nodes 0 --shards 6 \
      --prefetch 2 --out docs/runs/vr_full_protocol_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCALAR_KEYS = (
    "acc", "n_eval", "seq_acc", "n_eval_seq", "single_sample_acc",
    "seed_occ_acc", "peri_occ_acc", "seed_occ_total", "peri_occ_total",
    "seed_vr_acc", "seed_seq_acc", "n_seed_eval", "mean_occ_per_node",
    "seed_agreement", "resample_dup_frac", "seed_id_match_frac",
)


def make_cfg(args):
    from pyhgt_tpu.config import ExperimentConfig

    return ExperimentConfig(
        task_name="vr_controls", model_dir=args.dir,
        n_hid=args.n_hid, n_heads=8, n_layers=args.n_layers,
        prev_norm=True, last_norm=True, use_rte=True,
        sample_depth=args.sample_depth, sample_width=args.sample_width,
        batch_size=args.batch_size, vr_num=args.vr_num,
        save_kv=True, calibrate_caps=True,
        edge_bf16=True, seg_pallas=True,
    )


def shard_nodes(pred, cfg, n_shards):
    rng = np.random.default_rng(cfg.seed + 3)
    nodes = np.where(pred.task.masks["test"])[0]
    nodes = nodes[rng.permutation(len(nodes))]
    return np.array_split(nodes, n_shards)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dir", default="/tmp/ogbn_mag_proxy")
    ap.add_argument("--graph", default=None, help="graph dir (default <dir>/graph_1.0)")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default <dir>/ogbn_mag_proxy_hgt)")
    ap.add_argument("--max_eval_nodes", type=int, default=2048,
                    help="0 = no subsampling: seed EVERY split node (the "
                         "reference's full protocol)")
    ap.add_argument("--vr_num", type=int, default=8)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--n_hid", type=int, default=512)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--sample_depth", type=int, default=6)
    ap.add_argument("--sample_width", type=int, default=520)
    ap.add_argument("--shards", type=int, default=1,
                    help=">1: run the eval in N sequential subprocesses "
                         "(bounds the axon per-transfer host leak)")
    ap.add_argument("--shard_idx", type=int, default=None,
                    help="internal: run one shard and save accumulators")
    ap.add_argument("--shard_dir", default="/tmp/vr_shards")
    ap.add_argument("--prefetch", type=int, default=0,
                    help="sample-prefetch threads inside the eval loop")
    ap.add_argument("--out", default="docs/runs/vr_controls_r5.json")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    gdir = args.graph or os.path.join(args.dir, "graph_1.0")
    ckpt = args.ckpt or os.path.join(args.dir, "ogbn_mag_proxy_hgt")

    # ---------------- parent of a sharded run ----------------
    if args.shards > 1 and args.shard_idx is None:
        os.makedirs(args.shard_dir, exist_ok=True)
        t0 = time.time()
        for i in range(args.shards):
            f = os.path.join(args.shard_dir, f"shard_{i}.npz")
            if os.path.exists(f):
                print(f"shard {i}: exists, skipping", flush=True)
                continue
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--dir", args.dir, "--graph", gdir, "--ckpt", ckpt,
                   "--max_eval_nodes", str(args.max_eval_nodes),
                   "--vr_num", str(args.vr_num),
                   "--batch_size", str(args.batch_size),
                   "--shards", str(args.shards), "--shard_idx", str(i),
                   "--shard_dir", args.shard_dir,
                   "--prefetch", str(args.prefetch),
                   "--n_hid", str(args.n_hid),
                   "--n_layers", str(args.n_layers),
                   "--sample_depth", str(args.sample_depth),
                   "--sample_width", str(args.sample_width)]
            if args.cpu:
                cmd.append("--cpu")
            r = subprocess.run(cmd)
            if r.returncode != 0:
                raise SystemExit(f"shard {i} failed rc={r.returncode}")
            print(f"shard {i}/{args.shards} done "
                  f"({time.time()-t0:.0f}s elapsed)", flush=True)
        out = merge_shards(args)
        out["wall_s"] = round(time.time() - t0, 1)
        out["shards"] = args.shards
        out["max_eval_nodes"] = args.max_eval_nodes
        out["vr_num"] = args.vr_num
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1, default=float)
        print("RESULT " + json.dumps(out, default=float), flush=True)
        return 0

    # ---------------- single process (or one shard) ----------------
    from pyhgt_tpu.experiments.serving import OgbnPredictor
    from pyhgt_tpu.graph.csr import CSRGraph
    from pyhgt_tpu.tasks import multi_sample_eval

    graph = CSRGraph.load_dir(gdir, mmap=True)
    print(f"graph: {graph}", flush=True)
    cfg = make_cfg(args)
    pred = OgbnPredictor(cfg, graph, ckpt, log=print)

    if args.shard_idx is not None:
        seeds = shard_nodes(pred, cfg, args.shards)[args.shard_idx]
        out = multi_sample_eval(
            pred.eval_forward, pred.params, pred.task, split="test",
            batch_size=cfg.batch_size, vr_num=cfg.vr_num,
            rng=np.random.default_rng(cfg.seed + 100 + args.shard_idx),
            seed_nodes=seeds, return_arrays=True,
            n_prefetch=args.prefetch,
        )
        os.makedirs(args.shard_dir, exist_ok=True)
        arrays = {k: out[k] for k in (
            "vr_scores", "vr_seen", "seq_scores", "seq_seen",
            "seed_scores", "seed_seen", "seed_seq_scores",
            "seed_seq_seen", "split_nodes", "occ_count", "counters",
            "agree_sum",
        )}
        tmp = os.path.join(args.shard_dir, f"shard_{args.shard_idx}.tmp.npz")
        np.savez_compressed(tmp, **arrays)
        os.replace(tmp, os.path.join(
            args.shard_dir, f"shard_{args.shard_idx}.npz"))
        print("SHARD " + json.dumps(
            {k: out[k] for k in SCALAR_KEYS}, default=float), flush=True)
        return 0

    t0 = time.time()
    out = multi_sample_eval(
        pred.eval_forward, pred.params, pred.task, split="test",
        batch_size=cfg.batch_size, vr_num=cfg.vr_num,
        rng=np.random.default_rng(cfg.seed + 3),
        max_nodes=args.max_eval_nodes or None,
        n_prefetch=args.prefetch,
    )
    out["wall_s"] = round(time.time() - t0, 1)
    out["max_eval_nodes"] = args.max_eval_nodes
    out["vr_num"] = args.vr_num
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("RESULT " + json.dumps(out, default=float), flush=True)
    return 0


def merge_shards(args):
    """Exact merge of disjoint-seed shard accumulators: scores sum, seen
    masks OR, counters add; final argmax accuracies recomputed on the
    merged arrays (identical math to the single-process evaluator)."""
    from pyhgt_tpu.graph.csr import CSRGraph

    gdir = args.graph or os.path.join(args.dir, "graph_1.0")
    g = CSRGraph.load_dir(gdir, mmap=True)
    y = np.asarray(g.aux["y"]).reshape(-1)

    shards = [np.load(os.path.join(args.shard_dir, f"shard_{i}.npz"))
              for i in range(args.shards)]
    s0 = shards[0]
    split_nodes = s0["split_nodes"]
    y_split = y[split_nodes]

    def msum(key):
        return np.sum([s[key] for s in shards], axis=0)

    def mor(key):
        out = s0[key].copy()
        for s in shards[1:]:
            out |= s[key]
        return out

    def _acc(scores, seen):
        idx = np.where(seen)[0]
        if not len(idx):
            return 0.0, 0
        pred = np.argmax(scores[idx], axis=-1)
        return float((pred == y_split[idx]).mean()), int(len(idx))

    vr_scores, vr_seen = msum("vr_scores"), mor("vr_seen")
    seq_scores, seq_seen = msum("seq_scores"), mor("seq_seen")
    seed_scores, seed_seen = msum("seed_scores"), mor("seed_seen")
    sseq_scores, sseq_seen = msum("seed_seq_scores"), mor("seed_seq_seen")
    occ = msum("occ_count")
    c = msum("counters")
    (single_hits, single_total, seed_hits, seed_total, peri_hits,
     peri_total, agree_n, dup_hits, dup_total, seed_id_match,
     seed_id_total) = [int(v) for v in c]
    agree_sum = float(np.sum([s["agree_sum"] for s in shards]))

    acc, n_eval = _acc(vr_scores, vr_seen)
    seq_acc, n_eval_seq = _acc(seq_scores, seq_seen)
    seed_vr_acc, n_seed_eval = _acc(seed_scores, seed_seen)
    seed_seq_acc, _ = _acc(sseq_scores, sseq_seen)
    return {
        "acc": acc, "n_eval": n_eval,
        "seq_acc": seq_acc, "n_eval_seq": n_eval_seq,
        "single_sample_acc": single_hits / max(single_total, 1),
        "seed_occ_acc": seed_hits / max(seed_total, 1),
        "peri_occ_acc": peri_hits / max(peri_total, 1),
        "seed_occ_total": seed_total, "peri_occ_total": peri_total,
        "seed_vr_acc": seed_vr_acc, "seed_seq_acc": seed_seq_acc,
        "n_seed_eval": n_seed_eval,
        "mean_occ_per_node": float(occ[occ > 0].mean())
        if (occ > 0).any() else 0.0,
        "seed_agreement": agree_sum / max(agree_n, 1),
        "resample_dup_frac": dup_hits / max(dup_total, 1),
        "seed_id_match_frac": seed_id_match / max(seed_id_total, 1),
    }


if __name__ == "__main__":
    sys.exit(main())
