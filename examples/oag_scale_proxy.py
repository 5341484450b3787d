"""OAG paper-field at CS-dataset scale, synthetically — the OAG-side
accuracy/stress proxy (sibling of examples/ogbn_mag_scale_proxy.py).

The real OAG dumps are unreachable here (zero egress; the preprocessed
pickles are 8.1 GB for CS, ``/root/reference/README.md:43``), and the
reference repo publishes no OAG node/edge counts — so this builds a
synthetic graph at representative CS-subgraph magnitudes with the OAG
schema slice the paper-field task exercises
(``/root/reference/OAG/train_paper_field.py``):

- papers/authors/fields/venues/affiliations with ``AP_write_first/other``,
  ``PP_cite``, ``PV_Journal``, ``PF_in_L2`` (the label relation),
  ``PF_in_L1`` and author ``in`` affiliation — plus auto reverses;
- OAG concat features (``feature_OAG``: node_emb ∥ emb ∥ log-citation,
  ``pyHGT/utils.py:47-70``) — papers take the zeros path for node_emb
  exactly like real OAG papers;
- temporal split train<2015 / valid 2015-16 / test>2016 (``:74-76``),
  edge timestamps = paper year;
- multi-hot L2-field labels drawn community-biased so the KL objective
  has real structure-carried signal; leakage masking is load-bearing
  (label edges touching the seed block are dropped,
  ``train_paper_field.py:111-122``).

The run covers: paper-field KL training at scale, candidate-list label
space (cand_list semantics, ``:82``), leakage masks, calibrated caps at
OAG fan-outs, the C++ sampler + batch prep, and the
``save_dir``/``load_dir(mmap=True)`` large-graph path.

Run (CPU smoke): python examples/oag_scale_proxy.py --scale 0.01 --cpu
Run (real chip): python examples/oag_scale_proxy.py --n_epoch 4
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# representative OAG-CS magnitudes (the repo publishes only GB sizes —
# README.md:43; these follow the WWW'20 paper's reported scale class)
SCALE_1 = dict(
    n_paper=544_000, n_author=510_000, n_field=45_000, n_venue=6_000,
    n_aff=9_000, n_l2=2_000,          # L2 label fields ⊂ fields
    ap_per_paper=3, cite_per_paper=5, pf_per_paper=3, pf1_per_paper=1,
    emb_dim=128,
)


def build(scale: float, seed: int = 0):
    from pyhgt_tpu.graph.csr import CSRGraph
    from pyhgt_tpu.graph.schema import GraphSchema, MetaRelation

    r = np.random.default_rng(seed)
    s = lambda n: max(int(n * scale), 16)
    nP, nA = s(SCALE_1["n_paper"]), s(SCALE_1["n_author"])
    nF, nV = s(SCALE_1["n_field"]), s(SCALE_1["n_venue"])
    nI = s(SCALE_1["n_aff"])
    nL2 = min(s(SCALE_1["n_l2"]), nF - 1)  # keep >=1 non-L2 field so the
    # L1 rollup ids (nL2..nF) stay in range at tiny --scale
    nC = max(min(nL2 // 8, 256), 4)   # latent communities

    comm_p = r.integers(0, nC, size=nP)
    comm_a = r.integers(0, nC, size=nA)
    # L2 fields are the first nL2 field ids; each belongs to a community
    comm_f2 = r.integers(0, nC, size=nL2)
    years = r.integers(2000, 2020, size=nP).astype(np.int64)

    def biased_pick(comm_src_rows, comm_tgt_of, n_tgt, q=0.85):
        """Per-row target biased to the source's community."""
        n = len(comm_src_rows)
        order = np.argsort(comm_tgt_of, kind="stable")
        sc = comm_tgt_of[order]
        starts = np.searchsorted(sc, np.arange(nC))
        ends = np.searchsorted(sc, np.arange(nC) + 1)
        lo, hi = starts[comm_src_rows], np.maximum(
            ends[comm_src_rows], starts[comm_src_rows] + 1)
        pick = order[np.minimum(
            lo + (r.random(n) * (hi - lo)).astype(np.int64), len(order) - 1)]
        return np.where(r.random(n) < q, pick,
                        r.integers(0, n_tgt, size=n))

    t0 = time.time()
    rep = lambda k: np.repeat(np.arange(nP), k)

    # authors write papers (first + other slots)
    p_ap = rep(SCALE_1["ap_per_paper"])
    a_ap = biased_pick(comm_p[p_ap], comm_a, nA)
    first = (np.arange(len(p_ap)) % SCALE_1["ap_per_paper"]) == 0
    # papers cite papers (older only, reference temporal semantics)
    p_c = rep(SCALE_1["cite_per_paper"])
    c_c = biased_pick(comm_p[p_c], comm_p, nP)
    keep = years[c_c] <= years[p_c]
    p_c, c_c = p_c[keep], c_c[keep]
    # paper -> L2 field labels (the signal), + coarse L1 rollups
    p_f = rep(SCALE_1["pf_per_paper"])
    f_f = biased_pick(comm_p[p_f], comm_f2, nL2, q=0.9)
    p_f1 = rep(SCALE_1["pf1_per_paper"])
    f_f1 = nL2 + (comm_p[p_f1] % max(nF - nL2, 1))
    # paper -> venue, author -> affiliation
    v_p = r.integers(0, nV, size=nP)
    i_a = r.integers(0, nI, size=nA)

    fwd = {
        ("author", "paper", "rev_AP_write_first"): (
            a_ap[first], p_ap[first], years[p_ap[first]]),
        ("author", "paper", "rev_AP_write_other"): (
            a_ap[~first], p_ap[~first], years[p_ap[~first]]),
        ("paper", "paper", "PP_cite"): (p_c, c_c, years[p_c]),
        ("field", "paper", "PF_in_L2"): (f_f, p_f, years[p_f]),
        ("field", "paper", "PF_in_L1"): (f_f1, p_f1, years[p_f1]),
        ("venue", "paper", "PV_Journal"): (v_p, np.arange(nP), years),
        ("affiliation", "author", "rev_in"): (
            i_a, np.arange(nA), np.full(nA, 2019)),
    }
    edges = {}
    metas = []
    for (tt, st, rel), (tgt, src, tm) in fwd.items():
        metas.append(MetaRelation(tt, st, rel))
        edges[(tt, st, rel)] = (tgt, src, tm)
        rrel = rel[len("rev_"):] if rel.startswith("rev_") else "rev_" + rel
        metas.append(MetaRelation(st, tt, rrel))
        edges[(st, tt, rrel)] = (src, tgt, tm)

    schema = GraphSchema(
        node_types=("paper", "author", "field", "venue", "affiliation"),
        metas=tuple(metas),
    )
    D = SCALE_1["emb_dim"]
    cent = r.normal(size=(nC, D)) * 0.25
    feats = {
        # papers: no node_emb column — the zeros path, like real OAG
        "paper": {
            "emb": (cent[comm_p] + r.normal(size=(nP, D))).astype(np.float32),
            "citation": r.pareto(1.5, size=nP).astype(np.float32) * 3,
        },
        "author": {
            "emb": (cent[comm_a] + r.normal(size=(nA, D))).astype(np.float32),
            "citation": r.pareto(1.5, size=nA).astype(np.float32) * 5,
            "node_emb": r.normal(size=(nA, 400)).astype(np.float32) * 0.05,
        },
        "field": {
            "emb": r.normal(size=(nF, D)).astype(np.float32) * 0.1,
            "citation": np.zeros(nF, np.float32),
            "node_emb": r.normal(size=(nF, 400)).astype(np.float32) * 0.05,
        },
        "venue": {
            "emb": r.normal(size=(nV, D)).astype(np.float32) * 0.1,
            "citation": np.zeros(nV, np.float32),
            "node_emb": r.normal(size=(nV, 400)).astype(np.float32) * 0.05,
        },
        "affiliation": {
            "emb": r.normal(size=(nI, D)).astype(np.float32) * 0.1,
            "citation": np.zeros(nI, np.float32),
        },
    }
    g = CSRGraph.from_arrays(
        schema=schema,
        num_nodes={"paper": nP, "author": nA, "field": nF, "venue": nV,
                   "affiliation": nI},
        edges=edges,
        features=feats,
    )
    print(f"built {g} in {time.time()-t0:.1f}s "
          f"(L2 label fields={nL2}, communities={nC})", flush=True)
    return g


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0,
                    help="fraction of the CS-scale magnitudes (1.0 = full)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n_epoch", type=int, default=3)
    ap.add_argument("--n_batch", type=int, default=16)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--sample_depth", type=int, default=6)
    ap.add_argument("--sample_width", type=int, default=128)
    ap.add_argument("--n_hid", type=int, default=512)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--dir", default="/tmp/oag_proxy")
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
    graph = CSRGraph.load_dir(gdir, mmap=True)
    print(f"mmap-loaded: {graph}", flush=True)

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.datasets.features import feature_oag
    from pyhgt_tpu.experiments import run_node_classification

    cfg = ExperimentConfig(
        task_name="oag_proxy_pf",
        model_dir=args.dir,
        n_hid=args.n_hid, n_heads=8, n_layers=args.n_layers,
        prev_norm=True, last_norm=True, use_rte=True,
        sample_depth=args.sample_depth, sample_width=args.sample_width,
        batch_size=args.batch_size, n_batch=args.n_batch, repeat=2,
        scheduler="cosine", max_lr=1e-3, clip=0.25,  # paper-field recipe
        n_epoch=args.n_epoch,
        save_kv=True, calibrate_caps=True,
        edge_bf16=True, seg_pallas=True,
    )
    out = run_node_classification(
        cfg, graph, label_meta=("field", "paper", "PF_in_L2"),
        multi_label=True, feature_fn=feature_oag,
    )
    res = dict(
        scale=args.scale,
        best_valid=out["best_valid"],
        test_ndcg=out["test_ndcg"],
        test_mrr=out["test_mrr"],
        last_epoch=out["history"][-1],
    )
    print("RESULT " + json.dumps(res, default=float), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
