"""ogbn-mag at REAL scale, synthetically — the accuracy/stress proxy.

The real OGB download is unreachable in this environment (zero egress —
pip and snap.stanford.edu both fail by name resolution; see STATUS.md for
the captured attempts), so this builds a synthetic heterogeneous graph
with the REAL ogbn-mag node/edge counts, schema, temporal split and
training recipe (``/root/reference/ogbn-mag/README.md:16-24``,
``train_ogbn_mag.py:36-58``):

  736,389 papers / 1,134,649 authors / 59,965 fields / 8,740 institutions
  writes 7.14M, cites 5.42M, has_topic 7.50M, affiliated_with 1.04M
  (+ auto reverses) = 42.2M directed edges; 349 classes; 128-dim paper
  features; year split train<2018 / valid=2018 / test=2019.

Labels are latent communities recoverable mostly from structure, so the
accuracy is a real end-to-end signal (chance = 1/349). The run
stress-tests exactly what the published recipe stresses: sample_width
520 / depth 6 batches, per-meta edge caps + overflow accounting at true
fan-outs, C++ sampler throughput on a 42M-edge graph, and the
``save_dir``/``load_dir(mmap=True)`` large-graph path (the 8.1 GB
OAG-CS pickle story, ``README.md:43``).

Run (CPU smoke): python examples/ogbn_mag_scale_proxy.py --scale 0.02 --cpu
Run (real chip): python examples/ogbn_mag_scale_proxy.py --n_epoch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# real ogbn-mag counts (ogb.nodeproppred 'ogbn-mag' metadata)
REAL = dict(
    n_paper=736_389, n_author=1_134_649, n_field=59_965, n_inst=8_740,
    e_writes=7_145_660, e_cites=5_416_271, e_topic=7_505_078,
    e_aff=1_043_998, n_classes=349, feat_dim=128,
)


def build(scale: float, seed: int = 0):
    from pyhgt_tpu.datasets.ogbn_mag import build_from_arrays

    r = np.random.default_rng(seed)
    s = lambda n: max(int(n * scale), 8)
    nP, nA = s(REAL["n_paper"]), s(REAL["n_author"])
    nF, nI = s(REAL["n_field"]), s(REAL["n_inst"])
    nC = min(REAL["n_classes"], max(nP // 64, 4))
    comm_p = r.integers(0, nC, size=nP)
    comm_a = r.integers(0, nC, size=nA)
    comm_f = r.integers(0, nC, size=nF)

    # community-biased endpoints: same community with prob q else uniform
    def endpoints(n_edges, comm_src, n_src, comm_tgt_of, n_tgt, q=0.8):
        src = r.integers(0, n_src, size=n_edges)
        same = r.random(n_edges) < q
        # a same-community target: rejection-free via per-community lists
        order = np.argsort(comm_tgt_of, kind="stable")
        sorted_comm = comm_tgt_of[order]
        starts = np.searchsorted(sorted_comm, np.arange(nC))
        ends = np.searchsorted(sorted_comm, np.arange(nC) + 1)
        c = comm_src[src]
        lo, hi = starts[c], np.maximum(ends[c], starts[c] + 1)
        pick = lo + (r.random(n_edges) * (hi - lo)).astype(np.int64)
        pick = order[np.minimum(pick, len(order) - 1)]
        tgt = np.where(same, pick, r.integers(0, n_tgt, size=n_edges))
        return src, tgt

    t0 = time.time()
    w_src, w_tgt = endpoints(s(REAL["e_writes"]), comm_a, nA, comm_p, nP)
    c_src, c_tgt = endpoints(s(REAL["e_cites"]), comm_p, nP, comm_p, nP)
    f_src, f_tgt = endpoints(s(REAL["e_topic"]), comm_p, nP, comm_f, nF)
    # real ogbn-mag has FEWER affiliation edges than authors (1.04M vs
    # 1.13M — not every author is affiliated); sample endpoints directly
    n_aff = s(REAL["e_aff"])
    a_src = r.integers(0, nA, size=n_aff)
    a_tgt = r.integers(0, nI, size=n_aff)

    years = r.integers(2010, 2020, size=nP)
    centroids = r.normal(size=(nC, REAL["feat_dim"])) * 0.3
    paper_x = (centroids[comm_p]
               + r.normal(size=(nP, REAL["feat_dim"]))).astype(np.float32)
    split = {
        "train": np.where(years < 2018)[0],
        "valid": np.where(years == 2018)[0],
        "test": np.where(years == 2019)[0],
    }
    g = build_from_arrays(
        edge_index={
            ("author", "writes", "paper"): np.stack([w_src, w_tgt]),
            ("paper", "cites", "paper"): np.stack([c_src, c_tgt]),
            ("paper", "has_topic", "field_of_study"): np.stack([f_src, f_tgt]),
            ("author", "affiliated_with", "institution"): np.stack([a_src, a_tgt]),
        },
        num_nodes={"paper": nP, "author": nA, "field_of_study": nF,
                   "institution": nI},
        paper_x=paper_x,
        years=years,
        y=comm_p,
        split=split,
    )
    print(f"built {g} in {time.time()-t0:.1f}s "
          f"(classes={nC}, chance={1/nC:.4f})", flush=True)
    return g


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="fraction of real ogbn-mag size (1.0 = full)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_epoch", type=int, default=3)
    ap.add_argument("--n_batch", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--sample_depth", type=int, default=6)
    ap.add_argument("--sample_width", type=int, default=520)
    ap.add_argument("--n_hid", type=int, default=512)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--dir", default="/tmp/ogbn_mag_proxy")
    ap.add_argument("--max_eval_nodes", type=int, default=512)
    ap.add_argument("--vr_num", type=int, default=8)
    ap.add_argument("--tgt_rank_cap", type=int, default=0,
                    help="Pallas tgt rank cap (round-3 kernel knob; "
                         "batches that violate it fall back per batch)")
    ap.add_argument("--tab_cap", type=int, default=0,
                    help="tab compaction cap (round-4 kernel knob; "
                         "per-batch fallback when a block occupies more "
                         "dt slots)")
    ap.add_argument("--softmax_tilemax", default="",
                    help="'' | on | auto (round-4; auto = runtime-guarded)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.dir, exist_ok=True)
    gdir = os.path.join(args.dir, f"graph_{args.scale}")
    from pyhgt_tpu.graph.csr import CSRGraph

    if os.path.exists(os.path.join(gdir, "manifest.json")):
        print(f"loading mmap graph from {gdir}", flush=True)
    else:
        g = build(args.scale)
        g.save_dir(gdir)
        del g
        print(f"saved to {gdir}", flush=True)
    # the large-graph path: memory-mapped arrays, nothing fully resident
    graph = CSRGraph.load_dir(gdir, mmap=True)
    print(f"mmap-loaded: {graph}", flush=True)

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.experiments import run_ogbn

    cfg = ExperimentConfig(
        task_name="ogbn_mag_proxy",
        model_dir=args.dir,
        n_hid=args.n_hid, n_heads=8, n_layers=args.n_layers,
        prev_norm=True, last_norm=True, use_rte=True,
        sample_depth=args.sample_depth, sample_width=args.sample_width,
        batch_size=args.batch_size, n_batch=args.n_batch, repeat=2,
        scheduler="onecycle", max_lr=5e-4, clip=1.0,
        n_epoch=args.n_epoch, vr_num=args.vr_num,
        save_kv=True, calibrate_caps=True,
        # production kernel config (bench-validated winners, PERF_NOTES r2)
        edge_bf16=True, seg_pallas=True,
        tgt_rank_cap=args.tgt_rank_cap,
        tab_cap=args.tab_cap, softmax_tilemax=args.softmax_tilemax,
    )
    out = run_ogbn(cfg, graph, max_eval_nodes=args.max_eval_nodes)
    res = dict(
        scale=args.scale,
        best_valid=out["best_valid"],
        test=out["test"],
        last_epoch=out["history"][-1],
    )
    print("RESULT " + json.dumps(
        {k: v for k, v in res.items() if k != "state"}, default=float
    ), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
