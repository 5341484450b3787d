"""HLO-level enforcement of the scatter-free edge-stage invariant.

The reference's edge compute is literally a scatter
(``/root/reference/pyHGT/conv.py:108`` segment softmax +
MessagePassing's scatter_add) — this repo exists to not do that on TPU.
Round 4 showed the rule must cover AUTODIFF TRANSPOSES too: one leftover
host-index gather (``k_tab[tab_sel]``, ~B*L-scale duplicate indices)
transposed to a duplicate-index scatter-add that XLA:TPU compiled
pathologically — 9x compile blow-up at bench shapes, compile-wedge +
worker kernel faults at the 26880 and 74k-proxy families (bisect in
``docs/runs/ogbn_mag_proxy_r4.json``, root-cause in
``docs/PERF_NOTES.md`` round-4b). The fix was a one-hot matmul; the rule
lived in CLAUDE.md as convention — this test makes it mechanical.

What is ALLOWED, deliberately: tiny trace-time-constant scatters. The
per-block parameter-bank gathers (``ops/hgt.py _block_gather``,
``block_src``/``block_rel`` — B=12 indices at any scale) transpose to
12-row scatter-adds; replacing them with one-hot matmuls (``ONEHOT_BWD``)
was measured +8 ms on chip (round-3: the tiny backward einsums disturb
the layout/VMEM-residency chain), so they stay. The NLL label pick
(`logp[arange, labels]`) transposes to an n_seed-row unique-index
scatter. Every pathological case had >=26k duplicate indices, so the
enforced invariant is a scale bound: **no scatter in the production
fwd+bwd program may carry more than MAX_SCATTER_INDICES indices** — at
bench shapes a new E- or B*L-scale scatter lands 1-2 orders of magnitude
above it, while the intentional sites sit 1-2 below.
"""

import re

import jax
import numpy as np
import pytest

# intentional sites are <=n_seed (128 at bench); the crash class starts
# at ~26k. Anything in between deserves a human look — keep the bound
# tight to the known-good side.
MAX_SCATTER_INDICES = 1024


def _production_lowered(**overrides):
    from pyhgt_tpu.flagship import build_flagship, synth_flagship_batch

    knobs = dict(
        save_kv=True,
        edge_bf16=True,
        seg_pallas=True,
        seg_rank_cap=64,
        tab_cap=64,
        softmax_tilemax="on",
    )
    knobs.update(overrides)
    fl = build_flagship("tiny", **knobs)
    batch, labels = synth_flagship_batch(fl, seed=0)
    se = fl.sort(batch)
    params = fl.init_params(jax.random.key(0), batch, se=se)
    loss = fl.loss_fn_single()
    args = (params, jax.random.key(1), *fl.batch_args(batch), se, labels)
    return jax.jit(jax.grad(loss)).lower(*args).as_text()


def scatter_index_counts(stablehlo: str):
    """[(n_indices, signature)] for every stablehlo.scatter in the text.

    n_indices = product of the scatter_indices tensor's dims excluding
    the index_vector_dim (trailing when its extent is the index depth).
    """
    out = []
    for m in re.finditer(r'"stablehlo\.scatter"', stablehlo):
        seg = stablehlo[m.start() : m.start() + 4000]
        sig = re.search(r"\}\) : \(([^)]*)\) -> ", seg)
        if not sig:  # pragma: no cover - unexpected printer format
            out.append((float("inf"), seg[:160]))
            continue
        operands = re.findall(r"tensor<([^>]*)>", sig.group(1))
        idx_dims = [int(d) for d in operands[1].split("x")[:-1]]
        # drop the index-vector dim (the innermost, size = index depth)
        n = int(np.prod(idx_dims[:-1])) if len(idx_dims) > 1 else (
            idx_dims[0] if idx_dims else 1
        )
        out.append((n, sig.group(0)[:200]))
    return out


@pytest.mark.parametrize("knobs", [
    {},                                  # full bench kernel-knob set
    {"tab_cap": 0, "seg_rank_cap": 0,    # base sorted path, no caps
     "softmax_tilemax": ""},
])
def test_production_train_step_has_no_large_scatter(knobs):
    text = _production_lowered(**knobs)
    counts = scatter_index_counts(text)
    assert counts, "no scatters at all? parser broke — inspect the text"
    bad = [(n, sig) for n, sig in counts if n > MAX_SCATTER_INDICES]
    assert not bad, (
        "large scatter found in the production fwd+bwd program — the "
        "round-4 XLA:TPU crash class (duplicate-index scatter-add "
        "transposes wedge the backend at big shape families; see "
        "docs/runs/ogbn_mag_proxy_r4.json). Replace the offending "
        "gather's backward with a one-hot matmul or permutation "
        "(docs/DESIGN.md):\n"
        + "\n".join(f"  {n} indices: {sig}" for n, sig in bad)
    )
    # the known-intentional sites stay tiny — record the ceiling so a
    # creeping index count shows up as a diff here, not a TPU fault
    assert max(n for n, _ in counts) <= 128


def test_scatter_parser_sees_block_gathers():
    """Sanity: the parser finds the 12-index block-gather transposes
    (8 per conv layer x 2 layers at tiny shapes), so an empty 'bad' list
    means verified-clean rather than parsed-nothing."""
    text = _production_lowered()
    counts = scatter_index_counts(text)
    twelves = [n for n, _ in counts if n == 12]
    assert len(twelves) >= 8
