"""Observability: structured metrics, profiling, debug toggles.

The reference's telemetry is print statements and a never-persisted
``stats`` list (``/root/reference/OAG/train_paper_field.py:283-286``),
seaborn curves (``ogbn-mag/train_ogbn_mag.py:203-215``), and an attention
tensor stashed on the module for visualization (``pyHGT/conv.py:106-108``).
Here:

- :class:`MetricsLogger` appends one JSON object per event to a .jsonl
  file (and optionally echoes to stdout);
- :func:`profile_trace` wraps a step in a ``jax.profiler`` trace;
- :func:`debug_nans` toggles ``jax_debug_nans`` in a context;
- throughput counters (edges/s, nodes/s) are first-class fields.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax


class MetricsLogger:
    """Append-only JSONL metrics sink with wall-clock stamping."""

    def __init__(self, path: Optional[str] = None, echo: bool = False) -> None:
        self.path = path
        self.echo = echo
        self._t0 = time.time()
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a", buffering=1)
        else:
            self._f = None

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"event": event, "t": round(time.time() - self._t0, 3), **fields}
        line = json.dumps(rec, default=float)
        if self._f:
            self._f.write(line + "\n")
        if self.echo:
            print(line, flush=True)
        return rec

    def close(self) -> None:
        if self._f:
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Collect a jax.profiler trace (TensorBoard/xplane format) around a
    block — the step-level upgrade of the reference's wall-clock prints."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Scoped ``jax_debug_nans`` (functional-model analogue of the
    race/sanitizer slot in SURVEY.md §5)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def throughput(n_edges: int, n_layers: int, step_seconds: float) -> Dict[str, float]:
    """The BASELINE.json headline counter: edges/s/chip."""
    return {
        "edges_per_s": n_edges * n_layers / max(step_seconds, 1e-12),
        "step_ms": step_seconds * 1e3,
    }
