"""Minimal repro: duplicate-index scatter-add transposes wedge XLA:TPU.

Round-4 finding (full bisect: docs/runs/ogbn_mag_proxy_r4.json; trace:
docs/PERF_NOTES.md round-4b): the compact-table selection `k_tab[tab_sel]`
— a [768]-index gather from a [2880, 512] table with duplicate indices
(dead compact slots repeat their block's last row) — has an autodiff
transpose that is a duplicate-index scatter-add. In the full train step
that one op cost:

  - bench family (edge_cap 26624): 412 s XLA:TPU compile vs 46 s with the
    one-hot-matmul selection (9x);
  - edge_cap 26880 family: 28-min compile wedge, then a TPU worker
    "kernel fault" (INTERNAL) — 2/2 reproducible;
  - 74k-edge proxy family: worker kernel faults, 64 faults / 128 runs.

This script isolates the pattern: the same gather -> per-edge expand ->
reduce chain, grad wrt the table, gather-transpose vs one-hot-matmul
backward, compile time measured for each at several shape families.
Each (family, variant) runs in its OWN SUBPROCESS under a hard timeout
— a wedged native compile cannot be interrupted from Python (signals
only deliver between bytecodes), so the parent kills and records it.
Run on the real chip (no flag) or --cpu. Prints one JSON line per case.

Round-5 measurement on the chip: the minimal chain REPRODUCES the
pathology standalone — the gather variant's backend compile ran >11 min
without returning at the bench family while the one-hot variant
compiles in seconds (see docs/runs/scatter_repro_r5.json for the final
numbers) — so the bug does not need the full step's fusion context.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def run_case(rows, sel_n, d, E, variant, cpu):
    import jax
    import jax.numpy as jnp

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    # duplicate-heavy selection, like _compact_tab's dead-slot repeats
    sel = np.sort(rng.integers(0, rows, size=sel_n)).astype(np.int32)
    oh = np.zeros((sel_n, rows), np.float32)
    oh[np.arange(sel_n), sel] = 1.0
    eidx = rng.integers(0, sel_n, size=E).astype(np.int32)

    def loss(tab, x):
        if variant == "onehot":
            # HIGHEST precision = exact 0/1 selection, as the production
            # _tab_select does (default TPU precision lowers f32 matmuls
            # to bf16 passes and drifts the checksum vs the gather)
            t = jnp.matmul(jnp.asarray(oh), tab,
                           precision=jax.lax.Precision.HIGHEST)
        else:
            t = tab[sel]
        e = t[eidx]                      # [E, D] per-edge expand
        return jnp.sum(e * x)

    tab = jnp.asarray(rng.normal(size=(rows, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(E, d)), jnp.float32)
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    t0 = time.time()
    c = g.lower(tab, x).compile()
    dt = time.time() - t0
    t1 = time.time()
    out = c(tab, x)
    val = float(jnp.sum(out[0]))         # sync through a fetch
    print(json.dumps(dict(
        edges=E, variant=variant, compile_s=round(dt, 2),
        first_run_s=round(time.time() - t1, 3), ok=True,
        checksum=round(val, 3),
    )), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=2880)   # B*L table rows
    ap.add_argument("--sel", type=int, default=768)     # B*cap selected
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--edges", type=int, nargs="*",
                    default=[26624, 26880, 53248])
    ap.add_argument("--case_timeout", type=int, default=900)
    ap.add_argument("--case", nargs=2, metavar=("E", "VARIANT"),
                    help="internal: run one case in-process")
    args = ap.parse_args()

    if args.case:
        run_case(args.rows, args.sel, args.d, int(args.case[0]),
                 args.case[1], args.cpu)
        return 0

    for E in args.edges:
        for variant in ("gather", "onehot"):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--rows", str(args.rows), "--sel", str(args.sel),
                   "--d", str(args.d), "--case", str(E), variant]
            if args.cpu:
                cmd.append("--cpu")
            t0 = time.time()
            try:
                r = subprocess.run(
                    cmd, capture_output=True, text=True,
                    timeout=args.case_timeout,
                )
                line = next((ln for ln in r.stdout.splitlines()
                             if ln.startswith("{")), None)
                if line:
                    print(line, flush=True)
                else:
                    print(json.dumps(dict(
                        edges=E, variant=variant, ok=False,
                        wall_s=round(time.time() - t0, 1),
                        error=(r.stderr.strip().splitlines() or ["?"])[-1][:200],
                    )), flush=True)
            except subprocess.TimeoutExpired:
                print(json.dumps(dict(
                    edges=E, variant=variant, ok=False,
                    wall_s=round(time.time() - t0, 1),
                    error=f"compile wedge: killed after {args.case_timeout}s "
                          "(the round-4 pathology — the one-hot variant "
                          "compiles in seconds)",
                )), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
