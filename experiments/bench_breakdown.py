"""Decompose the flagship bench train step on the real chip.

Probe3 showed XLA random [E,D] gathers cost only ~1.7 ms (≈270 GB/s) —
4x faster than round-1 PERF_NOTES assumed — so the 304 ms step must be
spent elsewhere. This measures each stage by subtraction (dispatch floor
~0.8 ms/call is reported alongside).

Stages:
  a. full train step (fwd+bwd+adamw)           — the bench number
  b. value_and_grad only (no optimizer)        — a-b = optimizer cost
  c. fwd loss only                             — b-c ≈ backward cost
  d. single hgt_edge_stage fwd (bench shapes)
  e. single hgt_edge_stage fwd+bwd (sum-grad)
  f. seg_sum_tiled alone on [E, 512]
  g. permute-gather [E,512][perm] alone (the backward transpose input)
  h. full model fwd with save_kv toggled
  i. full step with edge_impl='segment' (XLA scatter path, for the record)
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
    return float(jnp.sum(leaves[0]) * 0 + jnp.asarray(0.0)) + float(
        jnp.mean(leaves[0])
    )


def bench(fn, *args, iters=5, name=""):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.1f} ms", flush=True)
    return dt


def main():
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch
    from pyhgt_tpu.train.optim import cosine_schedule, make_optimizer
    from pyhgt_tpu.train.step import TrainState, make_train_step

    fl = build_flagship("bench")
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

    # a. full step
    step = make_train_step(loss_fn, tx, donate=False)
    sa = None
    def run_step():
        s, l = step(state, rng, *bargs, se_d, y)
        return l
    bench(run_step, name="a full-step", iters=5)

    # b. value_and_grad
    vg = jax.jit(lambda p: jax.value_and_grad(
        lambda pp: loss_fn(pp, rng, *bargs, se_d, y))(p))
    bench(vg, state.params, name="b value_and_grad", iters=5)

    # c. fwd loss
    fwd = jax.jit(lambda p: loss_fn(p, rng, *bargs, se_d, y))
    bench(fwd, state.params, name="c fwd-loss", iters=5)

    # d/e. edge stage alone at bench shapes
    from pyhgt_tpu.ops.sorted_hgt import hgt_edge_stage

    T, C = fl.layout.num_types, fl.layout.node_cap
    D = fl.cfg.n_hid
    H = fl.cfg.n_heads
    dk = D // H
    Bb = len(fl.layout.blocks)
    L = 240
    key = jax.random.key(2)
    q_n = jax.random.normal(key, (T * C, D), jnp.float32) * 0.1
    k_rel = jax.random.normal(key, (Bb * C, D), jnp.float32) * 0.1
    v_rel = jax.random.normal(key, (Bb * C, D), jnp.float32) * 0.1
    k_tab = jax.random.normal(key, (Bb * L, D), jnp.float32) * 0.1
    v_tab = jax.random.normal(key, (Bb * L, D), jnp.float32) * 0.1
    E = se.edge_tgt.shape[0]
    pri_e = jnp.ones((E, H), jnp.float32)
    dims = (H, dk, True, True)  # use_rte, save_kv

    f_edge = jax.jit(lambda *a: hgt_edge_stage(*a, dims, se_d))
    bench(f_edge, q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
          name="d edge-stage fwd (save_kv)", iters=5)

    def edge_loss(q, kr, vr, kt, vt, pe):
        return jnp.sum(hgt_edge_stage(q, kr, vr, kt, vt, pe, dims, se_d))

    g_edge = jax.jit(jax.grad(edge_loss, argnums=(0, 1, 2, 3, 4, 5)))
    bench(g_edge, q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
          name="e edge-stage fwd+bwd (save_kv)", iters=5)

    dims2 = (H, dk, True, False)
    def edge_loss2(q, kr, vr, kt, vt, pe):
        return jnp.sum(hgt_edge_stage(q, kr, vr, kt, vt, pe, dims2, se_d))
    g_edge2 = jax.jit(jax.grad(edge_loss2, argnums=(0, 1, 2, 3, 4, 5)))
    bench(g_edge2, q_n, k_rel, v_rel, k_tab, v_tab, pri_e,
          name="e2 edge-stage fwd+bwd (no save_kv)", iters=5)

    # f. tiled segment sum alone
    from pyhgt_tpu.ops.sorted_hgt import seg_sum_tiled

    data = jax.random.normal(key, (E, D), jnp.float32)
    f_seg = jax.jit(lambda d: seg_sum_tiled(
        d, se_d.tl_tgt, se_d.live_idx_tgt, se_d.seg_ptr2_tgt))
    bench(f_seg, data, name="f seg_sum_tiled [E,512]", iters=5)

    # g. permute gather alone (backward transpose input)
    perm = se_d.perm_src
    f_perm = jax.jit(lambda d: jnp.sum(d[perm] * 1.0001, axis=0))
    bench(f_perm, data, name="g permute-gather [E,512]", iters=5)

    # g2. permute-gather feeding a tiled reduce (the real backward pattern)
    f_pseg = jax.jit(lambda d: seg_sum_tiled(
        d[perm], se_d.tl_src, se_d.live_idx_src, se_d.seg_ptr2_src))
    bench(f_pseg, data, name="g2 permute+seg_sum_tiled", iters=5)

    # h. plain gathers matching the fwd pattern (k/v/q+rte)
    f_gath = jax.jit(lambda kr, kt: jnp.sum(
        (kr[se_d.gidx] + kt[se_d.tabidx]) * 1.0001, axis=0))
    bench(f_gath, k_rel, k_tab, name="h k_e gather+rte-add", iters=5)

    print("done", flush=True)


if __name__ == "__main__":
    main()
