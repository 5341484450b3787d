"""Step decomposition + next-kernel-variant probes under the round-2
production config (edge_bf16 + seg_pallas, 224 ms full step).

Questions this answers (see docs/PERF_NOTES.md for the outcomes):
  a/b/c. where the 224 ms goes now (optimizer / backward / forward)
  d/e.   edge stage fwd and fwd+bwd marginals with the Pallas kernel
  f.     live_partials alone: bf16 vs f32-hi/lo input, D=512
  f2.    PAIRED reductions: one [E, 2D] call vs two [E, D] calls (g_k/g_v
         share the src grouping — pairing halves dispatch + one-hot cost)
  g.     permute-gather feeding live_partials (the real backward pattern)
  h.     softmax narrow-stage marginal ([E,H] seg_max + exp + seg_sum + div)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.mean(leaves[0].astype(jnp.float32)))


def bench(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


def main():
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    fl = build_flagship("bench")  # edge_bf16 + seg_pallas defaults now
    batch, labels = synth_flagship_batch(fl, seed=0, edge_fill=1.0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se)
    tx = make_optimizer(cosine_schedule(1e-3, 1000), weight_decay=0.01,
                        clip_norm=0.25, params=params)
    state = TrainState.create(params, tx)
    loss_fn = fl.loss_fn_single()
    rng = jax.random.key(1)
    bargs = tuple(jax.device_put(np.asarray(a)) for a in fl.batch_args(batch))
    se_d = jax.device_put(se)
    y = jax.device_put(np.asarray(labels))

    step = make_train_step(loss_fn, tx, donate=False)
    bench(lambda: step(state, rng, *bargs, se_d, y)[1],
          name="a full-step", iters=5)
    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda pp: loss_fn(pp, rng, *bargs, se_d, y))(p))
    bench(vg, state.params, name="b value_and_grad", iters=5)
    fwd = jax.jit(lambda p: loss_fn(p, rng, *bargs, se_d, y))
    bench(fwd, state.params, name="c fwd-loss", iters=5)

    from pyhgt_tpu.ops.sorted_hgt import hgt_edge_stage

    T, C = fl.layout.num_types, fl.layout.node_cap
    D, H = fl.cfg.n_hid, fl.cfg.n_heads
    dk = D // H
    Bb = len(fl.layout.blocks)
    L = 240
    key = jax.random.key(2)
    bf = jnp.bfloat16
    q_n = (jax.random.normal(key, (T * C, D), jnp.float32) * 0.1).astype(bf)
    k_rel = (jax.random.normal(key, (Bb * C, D), jnp.float32) * 0.1).astype(bf)
    v_rel = (jax.random.normal(key, (Bb * C, D), jnp.float32) * 0.1).astype(bf)
    k_tab = (jax.random.normal(key, (Bb * L, D), jnp.float32) * 0.1).astype(bf)
    v_tab = (jax.random.normal(key, (Bb * L, D), jnp.float32) * 0.1).astype(bf)
    E = se.edge_tgt.shape[0]
    pri_e = jnp.ones((E, H), jnp.float32)
    dims = (H, dk, True, True, False, True)  # rte, save_kv, permute, pallas

    f_edge = jax.jit(lambda *a: hgt_edge_stage(*a, dims, se_d))
    bench(f_edge, q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
          name="d edge-stage fwd (bf16+pallas)", iters=5)

    def edge_loss(q, kr, vr, kt, vt, pe):
        return jnp.sum(hgt_edge_stage(q, kr, vr, kt, vt, pe, dims, se_d)
                       .astype(jnp.float32))

    g_edge = jax.jit(jax.grad(edge_loss, argnums=(0, 1, 2, 3, 4, 5)))
    bench(g_edge, q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
          name="e edge-stage fwd+bwd (bf16+pallas)", iters=5)

    from pyhgt_tpu.ops.pallas_seg import live_partials
    from pyhgt_tpu.ops.sorted_hgt import seg_sum_csr, seg_sum_tiled

    data = (jax.random.normal(key, (E, D), jnp.float32) * 0.1).astype(bf)
    data32 = data.astype(jnp.float32)
    paux = jax.device_put(se.pseg_tgt)

    f_lp = jax.jit(lambda d: seg_sum_csr(live_partials(d, paux), paux.ptr2))
    bench(f_lp, data, name="f live_partials bf16 [E,512] (+csr)", iters=5)
    f_lp32 = jax.jit(
        lambda d: seg_sum_csr(live_partials(d, paux), paux.ptr2))
    bench(f_lp32, data32, name="f' live_partials f32-hi/lo [E,512] (+csr)",
          iters=5)

    # paired: [E, 2D] one call vs two [E, D] calls
    data2 = jnp.concatenate([data, data], axis=1)
    f_pair = jax.jit(lambda d: seg_sum_csr(live_partials(d, paux), paux.ptr2))
    bench(f_pair, data2, name="f2 live_partials bf16 [E,1024] paired", iters=5)
    f_two = jax.jit(lambda d: (
        seg_sum_csr(live_partials(d, paux), paux.ptr2),
        seg_sum_csr(live_partials(d * 1.0001, paux), paux.ptr2)))
    bench(f_two, data, name="f3 2x live_partials bf16 [E,512]", iters=5)

    # backward pattern: permute-gather feeding the kernel
    perm = se_d.perm_src
    paux_s = jax.device_put(se.pseg_src)
    f_pk = jax.jit(lambda d: seg_sum_csr(
        live_partials(d[perm], paux_s), paux_s.ptr2))
    bench(f_pk, data, name="g permute + live_partials bf16", iters=5)

    # softmax narrow-stage marginal: x1 vs x4 chained
    from pyhgt_tpu.ops.sorted_hgt import _softmax_tiled

    att = jax.random.normal(key, (E, H), jnp.float32)
    f_sm1 = jax.jit(lambda a: _softmax_tiled(a, se_d))
    bench(f_sm1, att, name="h softmax_tiled [E,8] x1", iters=5)
    f_sm4 = jax.jit(lambda a: _softmax_tiled(
        _softmax_tiled(_softmax_tiled(_softmax_tiled(a, se_d), se_d), se_d),
        se_d))
    bench(f_sm4, att, name="h softmax_tiled [E,8] x4 chained", iters=5)

    print("done", flush=True)


if __name__ == "__main__":
    sys.exit(main() or 0)
