"""Axon (tunneled TPU) host-memory leak probe — round-5 finding.

Every host->device transfer through the axon plugin retains its host
copy FOREVER (~the transferred array size per call, gc-immune,
independent of whether the source numpy buffer is fresh or reused
in place). Measured 2026-08-20 on this environment:

  28 MB array x 60 transfers: RSS 243 -> 1876 MB (26.7 MB/iter, linear)
  same-buffer in-place mutation variant: identical growth

Consequence: long evaluation loops that stream fresh batches to the
chip leak without bound — the round-5 full-protocol VR eval (4,568
sample+forward iterations, ~28 MB of batch arrays each) was OOM-killed
at 130 GB RSS after 3.4 h. Training runs survive because they are
shorter (the 20-epoch proxy run = ~800 transfers ~ 22 GB leaked).

Mitigation shipped: ``experiments/vr_controls.py --shards N`` runs the
eval in N sequential subprocesses (each leaks a bounded slice, exact
accumulator merge in the parent). This probe is the minimal evidence
for an upstream report; re-run after any axon/libtpu update:

  python experiments/axon_leak_probe.py            # on the chip
  python experiments/axon_leak_probe.py --cpu      # control: no leak
"""

import argparse
import gc
import json
import resource
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mb", type=int, default=28)
    ap.add_argument("--iters", type=int, default=60)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    def rss_mb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    n = args.mb * 1024 * 1024 // 4
    f = jax.jit(lambda x: (x * 2.0).sum())
    x = np.random.default_rng(0).normal(size=(n,)).astype(np.float32)
    start = rss_mb()
    samples = []
    for i in range(args.iters):
        x[0] = i                      # same buffer, mutated in place
        float(f(x))                   # transfer + sync via value fetch
        if (i + 1) % 15 == 0:
            gc.collect()
            samples.append((i + 1, rss_mb()))
    growth = (samples[-1][1] - samples[0][1]) / (
        samples[-1][0] - samples[0][0]
    ) if len(samples) > 1 else 0.0
    print(json.dumps(dict(
        backend=jax.default_backend(), transfer_mb=args.mb,
        iters=args.iters, rss_start_mb=start, rss_samples=samples,
        leak_mb_per_transfer=round(growth, 2),
        leaking=growth > args.mb * 0.5,
    )), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
