#!/usr/bin/env python
"""Fetch + convert real ogbn-mag on an egress-enabled machine.

This build environment has zero egress (see STATUS.md for the captured
failures: no `ogb` package, no pip index, `snap.stanford.edu` does not
resolve), so the real download must happen elsewhere.  Run this script on
a machine with network access, then copy the emitted `.npz` (~1.5 GB)
next to the repo and train:

    # on the egress-enabled machine
    pip install ogb
    python scripts/fetch_ogbn_mag.py --out /data/ogbn_mag_arrays.npz

    # on the TPU machine
    python scripts/fetch_ogbn_mag.py --convert /data/ogbn_mag_arrays.npz \
        --graph_dir /data/ogbn_mag_graph
    python -m pyhgt_tpu.run ogbn_mag --data /data/ogbn_mag_graph \
        --n_epoch 100 --n_batch 32 --batch_size 128 --sample_depth 6 \
        --sample_width 520 --n_hid 512 --n_layers 4 --save_kv \
        --model_dir /data/mag_run
    python -m pyhgt_tpu.run eval_ogbn_mag --data /data/ogbn_mag_graph \
        --model_dir /data/mag_run --vr_num 8

The npz schema matches `pyhgt_tpu.datasets.ogbn_mag.build_from_arrays`
(the array-native builder the gated OGB path also feeds, reference
pipeline: /root/reference/ogbn-mag/preprocess_ogbn_mag.py).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

EDGE_KEYS = {
    ("author", "writes", "paper"): "edge_writes",
    ("paper", "cites", "paper"): "edge_cites",
    ("paper", "has_topic", "field_of_study"): "edge_has_topic",
    ("author", "affiliated_with", "institution"): "edge_affiliated_with",
}


def fetch(out: str) -> int:
    try:
        from ogb.nodeproppred import NodePropPredDataset
    except ImportError:
        print("ogb is not installed; run `pip install ogb` on a machine "
              "with network access", file=sys.stderr)
        return 1
    ds = NodePropPredDataset(name="ogbn-mag")
    g, labels = ds[0]
    split = ds.get_idx_split()
    arrays = {
        "paper_x": g["node_feat_dict"]["paper"].astype(np.float32),
        "years": g["node_year"]["paper"].reshape(-1).astype(np.int64),
        "y": labels["paper"].reshape(-1).astype(np.int64),
        "split_train": split["train"]["paper"].reshape(-1),
        "split_valid": split["valid"]["paper"].reshape(-1),
        "split_test": split["test"]["paper"].reshape(-1),
    }
    for (s, r, t), key in EDGE_KEYS.items():
        arrays[key] = g["edge_index_dict"][(s, r, t)].astype(np.int64)
    for ntype, n in g["num_nodes_dict"].items():
        arrays[f"num_{ntype}"] = np.int64(n)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({os.path.getsize(out) / 1e9:.2f} GB)")
    return 0


def convert(npz_path: str, graph_dir: str) -> int:
    from pyhgt_tpu.datasets.ogbn_mag import build_from_arrays

    z = np.load(npz_path)
    g = build_from_arrays(
        edge_index={meta: z[key] for meta, key in EDGE_KEYS.items()},
        num_nodes={t: int(z[f"num_{t}"]) for t in
                   ("paper", "author", "field_of_study", "institution")},
        paper_x=z["paper_x"],
        years=z["years"],
        y=z["y"],
        split={k: z[f"split_{k}"] for k in ("train", "valid", "test")},
    )
    g.save_dir(graph_dir)
    print(f"saved {g} to {graph_dir} (mmap-loadable via CSRGraph.load_dir)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", help="fetch mode: output .npz path")
    ap.add_argument("--convert", help="convert mode: input .npz path")
    ap.add_argument("--graph_dir", default="/data/ogbn_mag_graph")
    args = ap.parse_args()
    if args.convert:
        return convert(args.convert, args.graph_dir)
    if args.out:
        return fetch(args.out)
    ap.error("pass --out (fetch) or --convert (convert)")
    return 2


if __name__ == "__main__":
    sys.exit(main())
