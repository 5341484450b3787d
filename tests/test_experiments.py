"""End-to-end experiment engine smoke tests on the toy graph (tiny configs)."""

import numpy as np
import pytest

from pyhgt_tpu.config import ExperimentConfig
from pyhgt_tpu.experiments import (
    run_author_disambiguation,
    run_node_classification,
    run_ogbn,
)


@pytest.fixture(scope="module")
def toy_env():
    from tests.conftest import make_toy_graph

    return make_toy_graph(n_paper=60, n_author=30, n_venue=5, seed=2).freeze()


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        n_hid=16, n_heads=4, n_layers=2, sample_depth=2, sample_width=8,
        batch_size=8, n_batch=2, repeat=1, n_pool=2, n_epoch=2,
        model_dir=str(tmp_path), node_cap=64, edge_cap=128,
        native_sampler=False, max_lr=1e-2,
    )
    base.update(kw)
    return ExperimentConfig(**base)


def test_run_node_classification_multi(toy_env, tmp_path):
    out = run_node_classification(
        _tiny_cfg(tmp_path, task_name="paper_venue_toy"),
        toy_env,
        label_meta=("venue", "paper", "PV_in"),
        multi_label=True,
        log=lambda s: None,
    )
    assert len(out["history"]) == 2
    assert 0.0 <= out["test_ndcg"] <= 1.0
    assert out["best_valid"] is not None


def test_run_ogbn(toy_env, tmp_path):
    rng = np.random.default_rng(0)
    n = toy_env.num_nodes["paper"]
    toy_env.aux.update(
        y=rng.integers(0, 4, n), years=np.full(n, 2015),
        train_mask=rng.random(n) < 0.5,
        valid_mask=(rng.random(n) < 0.3),
        test_mask=(rng.random(n) < 0.3),
    )
    out = run_ogbn(
        _tiny_cfg(tmp_path, task_name="ogbn_toy", n_epoch=1),
        toy_env,
        log=lambda s: None,
        max_eval_nodes=12,
    )
    assert 0.0 <= out["test"]["acc"] <= 1.0
    assert out["test"]["n_eval"] > 0


def test_run_author_disambiguation(toy_env, tmp_path):
    out = run_author_disambiguation(
        _tiny_cfg(tmp_path, task_name="ad_toy", n_epoch=1, batch_size=8),
        toy_env,
        first_meta=("author", "paper", "rev_AP_write"),
        write_meta=("paper", "author", "AP_write"),
        max_group=8,
        log=lambda s: None,
    )
    assert 0.0 <= out["test_ndcg"] <= 1.0


def test_cli_parser():
    from pyhgt_tpu.run import build_parser

    p = build_parser()
    a = p.parse_args(["ogbn_mag", "--data", "/tmp/x.pk", "--n_hid", "64",
                      "--no-use_RTE", "--clip", "1.0"])
    assert a.task == "ogbn_mag"
    assert a.n_hid == 64
    assert a.use_rte is False
    assert a.clip == 1.0


def test_evaluate_ogbn_from_checkpoint(toy_env, tmp_path):
    from pyhgt_tpu.experiments.engine import evaluate_ogbn

    rng = np.random.default_rng(1)
    n = toy_env.num_nodes["paper"]
    toy_env.aux.update(
        y=rng.integers(0, 4, n), years=np.full(n, 2015),
        train_mask=rng.random(n) < 0.5,
        valid_mask=(rng.random(n) < 0.3),
        test_mask=(rng.random(n) < 0.3),
    )
    cfg = _tiny_cfg(tmp_path, task_name="ogbn_eval_toy", n_epoch=1)
    out = run_ogbn(cfg, toy_env, log=lambda s: None, max_eval_nodes=8)
    ckpt = str(tmp_path / "ogbn_eval_toy_hgt")
    res = evaluate_ogbn(cfg, toy_env, ckpt, eval_mode="sequential",
                        max_eval_nodes=8, log=lambda s: None)
    assert 0.0 <= res["acc"] <= 1.0
