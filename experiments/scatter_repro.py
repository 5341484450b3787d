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
Run on the real chip (no flag) or --cpu. Prints one JSON line per
(family, variant).

Caveat recorded with the numbers: in round-4 the blow-up scaled with the
surrounding program (the full step's fusion context); if this minimal
chain compiles cleanly everywhere, that localizes the bug to
scatter-in-big-fusion-context rather than scatter-alone — still the
right test bed for the tests/test_scatter_free.py bound.
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rows", type=int, default=2880)   # B*L table rows
    ap.add_argument("--sel", type=int, default=768)     # B*cap selected
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--edges", type=int, nargs="*",
                    default=[26624, 26880, 53248])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    # duplicate-heavy selection, like _compact_tab's dead-slot repeats
    sel = np.sort(rng.integers(0, args.rows, size=args.sel)).astype(np.int32)
    oh = np.zeros((args.sel, args.rows), np.float32)
    oh[np.arange(args.sel), sel] = 1.0

    def make_loss(E, variant):
        eidx = rng.integers(0, args.sel, size=E).astype(np.int32)

        def loss(tab, x):
            t = jnp.asarray(oh) @ tab if variant == "onehot" else tab[sel]
            e = t[eidx]                      # [E, D] per-edge expand
            return jnp.sum(e * x)

        return loss

    tab = jnp.asarray(rng.normal(size=(args.rows, args.d)), jnp.float32)
    for E in args.edges:
        x = jnp.asarray(rng.normal(size=(E, args.d)), jnp.float32)
        for variant in ("gather", "onehot"):
            g = jax.jit(jax.grad(make_loss(E, variant), argnums=(0, 1)))
            t0 = time.time()
            try:
                c = g.lower(tab, x).compile()
                dt = time.time() - t0
                t1 = time.time()
                out = c(tab, x)
                val = float(jnp.sum(out[0]))  # sync through a fetch
                run = time.time() - t1
                rec = dict(edges=E, variant=variant, compile_s=round(dt, 2),
                           first_run_s=round(run, 3), ok=True,
                           checksum=round(val, 3))
            except Exception as exc:  # noqa: BLE001 - record the fault
                rec = dict(edges=E, variant=variant,
                           compile_s=round(time.time() - t0, 2), ok=False,
                           error=f"{type(exc).__name__}: {exc}"[:200])
            print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
