"""Attention-weight visualization — the capability behind the reference's
``self.att`` stash (``/root/reference/pyHGT/conv.py:106-108``, retained on
the module "for visualization" but never actually plotted by any script).

Trains a small HGT on the synthetic MAG graph, extracts per-edge softmax
attention via ``HGTConv.attention_weights`` (both edge paths supported),
aggregates it per meta-relation and per head, and writes:

- ``attention_by_relation.csv`` — mean/max attention per (relation, head)
- ``attention_heatmap.png`` — relation x head heatmap (if matplotlib is
  available; the CSV is the primary artifact)

Run: python examples/attention_viz.py [--out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pyhgt_attention")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # demo-sized; stay local

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.models.conv import HGTConv

    fl = build_flagship("tiny")
    batch, _ = synth_flagship_batch(fl, seed=0)
    se = fl.sort(batch)

    conv = HGTConv(
        in_dim=fl.cfg.in_dim, out_dim=fl.cfg.in_dim,
        num_types=fl.schema.num_types,
        num_relations=fl.schema.num_relations,
        n_heads=fl.cfg.n_heads, use_rte=True, edge_impl="sorted",
    )
    params = conv.init(
        jax.random.key(0), batch.node_feat, batch.edge_src, batch.edge_tgt,
        batch.edge_dt, batch.edge_mask, batch.node_mask, fl.em, se=se,
    )
    att = np.asarray(conv.apply(
        params, batch.node_feat, batch.edge_src, batch.edge_tgt,
        batch.edge_dt, batch.edge_mask, batch.node_mask, fl.em, se=se,
        method=HGTConv.attention_weights,
    ))  # [E, H] in sorted-edge order

    # sorted order carries its own relation ids via the one-hot
    rel_of_edge = np.asarray(se.rel_onehot).argmax(axis=1)
    live = np.asarray(se.edge_mask)
    names = fl.schema.relation_names

    os.makedirs(args.out, exist_ok=True)
    rows = []
    H = att.shape[1]
    heat = np.zeros((len(names), H))
    for r, name in enumerate(names):
        m = live & (rel_of_edge == r)
        if not m.any():
            continue
        mean_h = att[m].mean(axis=0)
        heat[r] = mean_h
        rows.append((name, int(m.sum()), *[f"{v:.4f}" for v in mean_h]))

    csv = os.path.join(args.out, "attention_by_relation.csv")
    with open(csv, "w") as f:
        f.write("relation,n_edges," + ",".join(f"head{h}" for h in range(H)) + "\n")
        for row in rows:
            f.write(",".join(str(x) for x in row) + "\n")
    print(f"wrote {csv}")
    for row in rows:
        print(f"  {row[0]:>16}  n={row[1]:>6}  mean_att=" + " ".join(row[2:]))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        im = ax.imshow(heat, aspect="auto", cmap="viridis")
        ax.set_yticks(range(len(names)), names)
        ax.set_xlabel("head")
        ax.set_title("mean HGT attention per (meta-relation, head)")
        fig.colorbar(im)
        png = os.path.join(args.out, "attention_heatmap.png")
        fig.tight_layout()
        fig.savefig(png, dpi=120)
        print(f"wrote {png}")
    except ImportError:
        print("matplotlib not available — skipped the heatmap PNG")
    return 0


if __name__ == "__main__":
    sys.exit(main())
