"""Predator training loop smoke test (tiny synthetic run)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_run_predator_training_synthetic(tmp_path):
    from apr_tpu.config import APRConfig
    from apr_tpu.training.predator_loop import run_predator_training
    import apr_tpu.data.datasets as dsmod

    cfg = APRConfig(
        trainer="PredatorTrainer",
        dataset="synthetic",
        final_feats_dim=16,
        first_feats_dim=32,
        gnn_feats_dim=32,
        generator_model="GenerativeMLP_54",
        point_generation_ratio=2,
        first_subsampling_dl=1.0,
        conv_radius=2.5,
        kp_capacities=(1024, 512, 256, 128),
        neighborhood_limits=(16, 16, 16, 16),
        point_capacity=2500,
        apc_capacity=2048,
        pos_radius=1.0, safe_radius=2.5, overlap_radius=1.2,
        matchability_radius=1.2, max_points=128,
        pair_min_dist=4.0, pair_max_dist=8.0,
        optimizer="SGD", lr=0.01, sgd_momentum=0.98,
        stat_freq=2,
        out_dir=str(tmp_path / "run"),
    )

    orig = dsmod.SyntheticPairDataset

    class Tiny(orig):
        def __init__(self, **kw):
            kw["num_pairs"] = 4 if kw.get("phase") == "train" else 2
            kw["n_points"] = 2000
            kw["apc_points"] = 1500
            kw["extent"] = 25.0
            super().__init__(**kw)

    dsmod.SyntheticPairDataset = Tiny
    try:
        summary = run_predator_training(cfg, max_epochs=1)
    finally:
        dsmod.SyntheticPairDataset = orig

    assert summary["steps"] == 4
    assert np.isfinite(summary["last_val"]["circle_loss"])
    out = tmp_path / "run"
    assert (out / "config.json").exists()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["phase"] == "val" for r in lines)
    assert os.path.isdir(out / "checkpoints")
