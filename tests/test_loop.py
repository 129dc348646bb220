"""End-to-end training-loop smoke test through the train.py CLI surface."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
@pytest.mark.veryslow  # ~4 min: compiles the fused loop's 4 programs
def test_run_training_synthetic(tmp_path):
    from train import config_from_args
    from apr_tpu.training.loop import run_training

    cfg = config_from_args([
        "--trainer", "GenerativePairTrainer",
        "--model", "ResUNetBN2",
        "--model_n_out", "16",
        "--conv1_kernel_size", "3",
        "--generator_model", "GenerativeMLP_54",
        "--point_generation_ratio", "2",
        "--dataset", "synthetic",
        "--batch_size", "2",
        "--num_pos_per_batch", "64",
        "--num_hn_samples_per_batch", "32",
        "--voxel_size", "1.0",
        "--point_capacity", "2048",
        "--capacities", "1024", "512", "256", "128",
        "--apc_capacity", "2048",
        "--max_epoch", "1",
        "--stat_freq", "2",
        "--out_dir", str(tmp_path / "run"),
    ])
    # shrink the synthetic dataset for CI speed
    import apr_tpu.data.datasets as dsmod

    orig = dsmod.SyntheticPairDataset
    cfg = cfg.replace(pair_min_dist=4.0, pair_max_dist=8.0)

    class Tiny(orig):
        def __init__(self, **kw):
            kw["num_pairs"] = 6 if kw.get("phase") == "train" else 2
            kw["n_points"] = 1500
            kw["apc_points"] = 1500
            kw["extent"] = 25.0
            super().__init__(**kw)

    dsmod.SyntheticPairDataset, _saved = Tiny, orig
    try:
        summary = run_training(cfg, max_epochs=1)
    finally:
        dsmod.SyntheticPairDataset = _saved

    assert summary["steps"] >= 3
    assert np.isfinite(summary["last_train"]["loss"])
    assert "last_val" in summary and np.isfinite(summary["last_val"]["loss"])
    # artifacts on disk: config.json, metrics.jsonl, checkpoints
    out = tmp_path / "run"
    assert (out / "config.json").exists()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["phase"] == "train" for r in lines)
    assert any(r["phase"] == "val" for r in lines)
    assert os.path.isdir(out / "checkpoints")

    # resume restores epoch and continues
    cfg2 = cfg.replace(resume=str(out), max_epoch=1)
    summary2 = run_training(cfg2, max_epochs=1)
    assert summary2["steps"] >= 0  # nothing to do, but restore path exercised
