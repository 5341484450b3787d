"""Dump the compiled bench-step HLO (with op metadata) for offline
fusion-name -> source-line attribution of profiler traces.

Usage: python experiments/dump_hlo.py [--cpu] [out_path]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    preset = "bench"
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        preset = "tiny"
    out = next((a for a in sys.argv[1:] if not a.startswith("--")),
               "/tmp/bench_step_hlo.txt")

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
    step = make_train_step(fl.loss_fn_single(), tx, donate=False)
    bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
    se_d = jax.device_put(se)
    y = jax.device_put(np.asarray(labels))
    rng = jax.random.key(1)
    compiled = step.lower(state, rng, *bargs, se_d, y).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
