"""Trace-level breakdown of the 155 ms step (round-2 third session).

The A/B sweep confirmed every gated knob loses — the remaining wins must
come from the step's actual composition. Capture a profiler trace of the
production bench step, parse the device track, and aggregate time by
fusion/op name so the next optimization targets measured cost, not
guesses.

Usage: python experiments/pallas_probe9.py [--cpu]
Writes the raw trace under /tmp/probe9_trace and prints the top ops.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def summarize(trace_dir: str, top: int = 45) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print("no trace file found under", trace_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-track events: pid/tid labels live in metadata events
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    by_name: dict = defaultdict(float)
    counts: dict = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        # XLA Ops track only (skip the step/overview tracks)
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_name[name] += dur
        counts[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"total device-track time: {total:.1f} ms (all steps captured)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:9.2f} ms  x{counts[name]:<4d} {name[:140]}")


def main() -> int:
    import jax

    preset = "bench"
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        preset = "tiny"

    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    fl = build_flagship(preset)
    batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se)
    tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                        clip_norm=0.25, params=params)
    state = TrainState.create(params, tx)
    step = make_train_step(fl.loss_fn_single(), tx)
    bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
    se_d = jax.device_put(se)
    y = jax.device_put(np.asarray(labels))
    rng = jax.random.key(1)
    for _ in range(3):
        state, loss = step(state, rng, *bargs, se_d, y)
    print("warm loss", float(loss), flush=True)

    trace_dir = "/tmp/probe9_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, loss = step(state, rng, *bargs, se_d, y)
        float(loss)
    summarize(trace_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
