"""CLI — ``python -m pyhgt_tpu.run <task> --data <graph.pk> [flags]``.

One entry point replacing the reference's four scripts; flag names follow
the reference argparse surface (``/root/reference/OAG/train_paper_field.py
:9-62``, ``ogbn-mag/train_ogbn_mag.py:21-64``) so recipes translate 1:1.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from pyhgt_tpu.config import PRESETS, ExperimentConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pyhgt_tpu.run", description=__doc__)
    p.add_argument(
        "task",
        choices=list(PRESETS.keys())
        + ["eval_ogbn_mag", "serve", "preprocess_oag"],
    )
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (eval_ogbn_mag / serve)")
    p.add_argument("--eval_mode", "--task_type", dest="eval_mode",
                   default="variance_reduce",
                   choices=["variance_reduce", "sequential"],
                   help="eval protocol; --task_type is the reference "
                        "alias (eval_ogbn_mag.py:29-30)")
    p.add_argument("--plot", action="store_true",
                   help="write loss/metric curves PNG next to the "
                        "checkpoint after training (train_ogbn_mag.py:29)")
    p.add_argument("--input_dir", default="./data/oag_raw",
                   help="preprocess_oag: raw TSV directory "
                        "(preprocess_OAG.py:14)")
    p.add_argument("--output_dir", default="./data/oag_output",
                   help="preprocess_oag: save_dir for the built CSRGraph "
                        "(preprocess_OAG.py:16)")
    p.add_argument("--citation_bar", type=int, default=1,
                   help="preprocess_oag: keep papers with citations >= "
                        "min(2020-year, 20)*bar (preprocess_OAG.py:22)")
    p.add_argument("--features", default="oag", choices=["oag", "mag"],
                   help="feature extractor for OAG tasks (oag = node_emb||"
                        "emb||log-citation concat; mag = plain emb gather)")
    p.add_argument("--label_meta", default=None,
                   help="label meta-relation as 'tgt_type,src_type,rel' "
                        "(defaults: field,paper,PF_in_L2 for paper_field; "
                        "venue,paper,PV_Journal for paper_venue)")
    p.add_argument("--serve_task", default="node", choices=["node", "link"],
                   help="serve mode: node = classification over sampled "
                        "subgraphs; link = two-tower matcher top-k "
                        "(offline author index + online paper queries)")
    p.add_argument("--coalesce_wait", default=0.0,
                   type=lambda s: s if s == "auto" else float(s),
                   help="serve micro-batching (node and link): wait this "
                        "many seconds after the first pending request, then "
                        "answer the burst with one coalesced model call; "
                        "'auto' (or a negative value = adaptive with that "
                        "max window) adapts the window to the arrival "
                        "process (serving.AdaptiveWait)")
    p.add_argument("--deadline_ms", type=float, default=None,
                   help="serve (adaptive coalescing): arrival-anchored "
                        "p95 queueing cap — the burst is answered once "
                        "its oldest request has waited this long, "
                        "however deep the backlog")
    p.add_argument("--http", type=int, default=0, metavar="PORT",
                   help="serve over HTTP on this port instead of "
                        "JSON-lines stdio (POST / with the same request "
                        "bodies; GET /healthz)")
    p.add_argument("--index_authors", type=int, default=0,
                   help="link-serve: pre-build the candidate index over the "
                        "first N grouped authors (0 = all); clients can "
                        "rebuild online with an index_authors request line")
    p.add_argument("--first_meta", default=None,
                   help="link family: first-author meta-relation as "
                        "'tgt,src,rel' (default author,paper,"
                        "rev_AP_write_first — the OAG schema, "
                        "train_author_disambiguation.py:79-86)")
    p.add_argument("--write_meta", default=None,
                   help="link family: authorship meta-relation as "
                        "'tgt,src,rel' (default paper,author,AP_write_first)")
    p.add_argument("--data", dest="data_path", default=None,
                   help="CSRGraph pickle, a save_dir directory "
                        "(mmap-loaded), or a reference .pk (auto-converted); "
                        "required for every task except preprocess_oag")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force the jax backend (the TPU plugin ignores the "
                        "JAX_PLATFORMS env var — this sets the config flag "
                        "before any device op, so --platform cpu works for "
                        "smoke runs even when the TPU link is down)")
    ref = ExperimentConfig()
    for f in dataclasses.fields(ExperimentConfig):
        if f.name == "data_path":
            continue
        # --task_name overrides the checkpoint filename prefix, exactly the
        # reference's --task_name role (OAG/train_paper_field.py:18,279)
        arg = "--" + f.name
        if f.type == "bool" or isinstance(getattr(ref, f.name), bool):
            p.add_argument(arg, action=argparse.BooleanOptionalAction,
                           default=None)
        else:
            p.add_argument(arg, type=type(getattr(ref, f.name))
                           if getattr(ref, f.name) is not None else int,
                           default=None)
    # reference-compatible aliases
    p.add_argument("--use_RTE", dest="use_rte",
                   action=argparse.BooleanOptionalAction, default=None)
    return p


def load_graph(path: str):
    import os

    from pyhgt_tpu.graph.csr import CSRGraph

    if os.path.isdir(path):
        # save_dir layout: memory-mapped arrays, nothing fully resident —
        # the large-graph path (the reference's 8.1 GB OAG-CS pickle
        # story, /root/reference/README.md:43)
        return CSRGraph.load_dir(path, mmap=True)
    try:
        return CSRGraph.load(path)
    except Exception:
        from pyhgt_tpu.datasets.convert import convert_reference_pickle

        return convert_reference_pickle(path)


def _link_metas(args) -> dict:
    """--first_meta/--write_meta 'tgt,src,rel' -> kwargs for the link
    family (training runner + LinkPredictor), defaults omitted."""
    out = {}
    if args.first_meta:
        out["first_meta"] = tuple(args.first_meta.split(","))
    if args.write_meta:
        out["write_meta"] = tuple(args.write_meta.split(","))
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    if args.task == "preprocess_oag":
        # reference preprocess_OAG.py surface: raw TSVs in, built graph
        # out; the save_dir layout memory-maps on load (large-graph path)
        from pyhgt_tpu.datasets.oag import preprocess_oag

        domain = args.domain if args.domain is not None else "_CS"
        g = preprocess_oag(
            args.input_dir, domain=domain, citation_bar=args.citation_bar,
        )
        g.save_dir(args.output_dir)
        print(f"saved CSRGraph save_dir to {args.output_dir}")
        return 0
    if not args.data_path:
        raise SystemExit(f"--data is required for task {args.task!r}")
    if args.task == "eval_ogbn_mag":
        preset = "ogbn_mag"
    elif args.task == "serve":
        # the predictor rebuilds the TRAINING model/state template before
        # restoring the checkpoint, so the preset must match the task the
        # checkpoint was trained on — link checkpoints come from
        # author_disambiguation, node ones from ogbn_mag
        preset = ("author_disambiguation" if args.serve_task == "link"
                  else "ogbn_mag")
    else:
        preset = args.task
    cfg = PRESETS[preset]
    overrides = {
        k: v for k, v in vars(args).items()
        if k not in ("task",) and v is not None
        and k in {f.name for f in dataclasses.fields(ExperimentConfig)}
    }
    cfg = cfg.replace(**overrides)

    from pyhgt_tpu.utils.experiment import args_print

    # serve keeps stdout as a pure JSON-lines channel
    args_print(dataclasses.asdict(cfg),
               file=sys.stderr if args.task == "serve" else None)
    graph = load_graph(cfg.data_path)

    from pyhgt_tpu.experiments import (
        run_author_disambiguation,
        run_node_classification,
        run_ogbn,
    )
    from pyhgt_tpu.datasets.features import feature_mag, feature_oag

    feat = feature_oag if args.features == "oag" else feature_mag

    def _label_meta(default):
        if args.label_meta:
            return tuple(args.label_meta.split(","))
        return default

    out = None
    if args.task == "paper_field":
        out = run_node_classification(
            cfg, graph, label_meta=_label_meta(("field", "paper", "PF_in_L2")),
            multi_label=True, feature_fn=feat,
        )
    elif args.task == "paper_venue":
        out = run_node_classification(
            cfg, graph,
            label_meta=_label_meta(("venue", "paper", "PV_Journal")),
            multi_label=False, feature_fn=feat,
        )
    elif args.task == "author_disambiguation":
        out = run_author_disambiguation(cfg, graph, **_link_metas(args))
    elif args.task == "ogbn_mag":
        out = run_ogbn(cfg, graph)
    elif args.task == "eval_ogbn_mag":
        from pyhgt_tpu.experiments.engine import evaluate_ogbn

        if not args.ckpt:
            raise SystemExit("--ckpt required for eval_ogbn_mag")
        evaluate_ogbn(cfg, graph, args.ckpt, eval_mode=args.eval_mode)
    elif args.task == "serve":
        from pyhgt_tpu.experiments.serving import (
            LinkPredictor,
            OgbnPredictor,
            serve_jsonl,
            serve_link_jsonl,
        )

        if not args.ckpt:
            raise SystemExit("--ckpt required for serve")
        # stdout is the JSON-lines response channel — route every log line
        # (sampler fallbacks, calibration, the served-count summary) to
        # stderr so clients can json.loads each stdout line
        err = lambda s: print(s, file=sys.stderr)
        if args.serve_task == "link":
            from pyhgt_tpu.experiments.serving import link_answer, serve_http

            lp = LinkPredictor(cfg, graph, args.ckpt, log=err,
                               **_link_metas(args))
            authors = sorted(
                a for g in lp.task.groups.values() for a in g
            )
            if args.index_authors > 0:
                authors = authors[: args.index_authors]
            err(f"indexing {len(authors)} candidate authors")
            lp.build_author_index(authors)
            if args.http:
                serve_http(link_answer(lp), port=args.http,
                           log=err).serve_forever()
            else:
                serve_link_jsonl(lp, log=err,
                                 coalesce_wait=args.coalesce_wait,
                                 deadline_ms=args.deadline_ms)
        else:
            from pyhgt_tpu.experiments.serving import node_answer, serve_http

            pred = OgbnPredictor(cfg, graph, args.ckpt, log=err)
            if args.http:
                serve_http(node_answer(pred), port=args.http,
                           log=err).serve_forever()
            else:
                serve_jsonl(pred, log=err,
                            coalesce_wait=args.coalesce_wait,
                            deadline_ms=args.deadline_ms)
    if args.plot and out and out.get("history"):
        import os

        from pyhgt_tpu.utils.experiment import plot_history

        png = os.path.join(cfg.model_dir, f"{cfg.task_name}_curves.png")
        print(f"plot: {plot_history(out['history'], png)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
