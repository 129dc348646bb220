"""Fused build+step parity: folding the NEXT batch's device-side build into
the train-step program (one executable per iteration, verdict-r3 item 4) must
change nothing numerically — the step half sees only the carried batch, the
build half sees only the raw arrays.

The reference's analog is DataLoader worker processes hiding all prep
(FCGF_APR/lib/complement_data_loader.py:1375-1382;
Predator_APR/datasets/dataloader.py:76-176): sustained == step time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import pad_points, synthetic_pair
from apr_tpu.training import get_trainer

pytestmark = [pytest.mark.slow, pytest.mark.veryslow]  # full models


FCGF_CFG = APRConfig(
    trainer="GenerativePairTrainer",
    model="ResUNetBN2",
    model_n_out=16,
    conv1_kernel_size=3,
    generator_model="GenerativeMLP_54",
    point_generation_ratio=2,
    batch_size=2,
    num_pos_per_batch=64,
    num_hn_samples_per_batch=32,
    voxel_size=1.0,
    point_capacity=2048,
    capacities=(1024, 512, 256, 128),
    apc_capacity=2048,
    lr=0.05,
)


def _raw(cfg, seeds):
    cols = [[] for _ in range(9)]
    for s in seeds:
        d = synthetic_pair(s, n_points=2000, apc_points=2000, distance=8.0,
                           extent=30.0)
        vals = [*pad_points(d["points0"], cfg.point_capacity),
                *pad_points(d["points1"], cfg.point_capacity),
                *pad_points(d["apc0"], cfg.apc_capacity),
                *pad_points(d["apc1"], cfg.apc_capacity),
                d["t_gt"].astype(np.float32)]
        for c, v in zip(cols, vals):
            c.append(v)
    return tuple(jnp.asarray(np.stack(c)) for c in cols)


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_fcgf_fused_step_matches_separate():
    trainer = get_trainer(FCGF_CFG)
    raw_a, raw_b = _raw(FCGF_CFG, (0, 1)), _raw(FCGF_CFG, (2, 3))
    batch = trainer.build_batch(raw_a)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(7)

    st_sep, m_sep = trainer.train_step(state, batch, key)
    built_sep = trainer.build_batch(raw_b)
    st_fus, m_fus, built_fus = trainer.train_step_fused(
        state, batch, raw_b, key)

    _assert_trees_equal(st_sep.params, st_fus.params)
    _assert_trees_equal(m_sep, m_fus)
    _assert_trees_equal(built_sep, built_fus)


def test_fcgf_fused_loop_matches_unfused(tmp_path):
    """run_training with fused_build on/off walks identical weights."""
    from apr_tpu.training.loop import run_training
    import apr_tpu.data.datasets as dsmod

    orig = dsmod.SyntheticPairDataset

    class Tiny(orig):
        def __init__(self, **kw):
            kw["num_pairs"] = 6 if kw.get("phase") == "train" else 2
            kw["n_points"] = 1500
            kw["apc_points"] = 1500
            kw["extent"] = 25.0
            super().__init__(**kw)

    base = FCGF_CFG.replace(
        dataset="synthetic", max_epoch=1, stat_freq=2,
        pair_min_dist=4.0, pair_max_dist=8.0,
    )
    dsmod.SyntheticPairDataset = Tiny
    try:
        s_fused = run_training(
            base.replace(out_dir=str(tmp_path / "fused"), fused_build=True),
            max_epochs=1)
        s_plain = run_training(
            base.replace(out_dir=str(tmp_path / "plain"), fused_build=False),
            max_epochs=1)
    finally:
        dsmod.SyntheticPairDataset = orig

    assert s_fused["steps"] == s_plain["steps"] >= 3
    np.testing.assert_allclose(
        s_fused["last_train"]["loss"], s_plain["last_train"]["loss"],
        rtol=1e-5)
    np.testing.assert_allclose(
        s_fused["last_val"]["loss"], s_plain["last_val"]["loss"], rtol=1e-5)


def _kp_cfg():
    return APRConfig(
        trainer="PredatorTrainer",
        dataset="synthetic",
        final_feats_dim=16,
        first_feats_dim=32,
        gnn_feats_dim=32,
        generator_model="GenerativeMLP_54",
        point_generation_ratio=2,
        first_subsampling_dl=1.0,
        conv_radius=2.5,
        kp_capacities=(768, 256, 128, 64),
        neighborhood_limits=(16, 16, 16, 16),
        point_capacity=1024,
        apc_capacity=1024,
        pos_radius=1.0,
        safe_radius=2.5,
        overlap_radius=1.2,
        matchability_radius=1.2,
        max_points=128,
        optimizer="SGD",
        lr=0.01,
        sgd_momentum=0.98,
    )


def test_predator_fused_step_matches_separate():
    from apr_tpu.training.predator import PredatorTrainer

    cfg = _kp_cfg()
    trainer = PredatorTrainer(cfg)

    def raw_group(seed0):
        cols = [[] for _ in range(9)]
        for s in (seed0, seed0 + 1):
            d = synthetic_pair(s, n_points=800, apc_points=800, distance=6.0,
                               extent=25.0)
            vals = [*pad_points(d["points0"], cfg.point_capacity),
                    *pad_points(d["points1"], cfg.point_capacity),
                    *pad_points(d["apc0"], cfg.apc_capacity),
                    *pad_points(d["apc1"], cfg.apc_capacity),
                    d["t_gt"].astype(np.float32)]
            for c, v in zip(cols, vals):
                c.append(v)
        return tuple(jnp.asarray(np.stack(c)) for c in cols)

    raw_a, raw_b = raw_group(0), raw_group(2)
    batch = trainer.build_batch_group(raw_a)
    one = jax.tree.map(lambda x: x[0], batch)
    state = trainer.init_state(jax.random.PRNGKey(0), one)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    ws = jnp.asarray(0.0)
    pw = jnp.asarray([0.5, 0.5])

    st_sep, m_sep = trainer.train_step_batched(state, batch, keys, ws, pw)
    built_sep = trainer.build_batch_group(raw_b)
    st_fus, m_fus, built_fus = trainer.train_step_batched_fused(
        state, batch, keys, ws, raw_b, pw)

    _assert_trees_equal(st_sep.params, st_fus.params)
    _assert_trees_equal(m_sep, m_fus)
    _assert_trees_equal(built_sep, built_fus)


def test_predator_fused_loop_matches_unfused(tmp_path):
    """run_predator_training with fused_build on/off walks identical
    weights — covers the loop bookkeeping unique to the fused path (carried
    built_pw pair-weights, tail step via raw_prev, deferred-metric flush)."""
    import json

    from apr_tpu.config import APRConfig
    from apr_tpu.training.predator_loop import run_predator_training
    import apr_tpu.data.datasets as dsmod

    def cfg(out_dir, fused):
        return APRConfig(
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
            out_dir=out_dir,
            fused_build=fused,
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
        s_fused = run_predator_training(
            cfg(str(tmp_path / "fused"), True), max_epochs=2)
        s_plain = run_predator_training(
            cfg(str(tmp_path / "plain"), False), max_epochs=2)
    finally:
        dsmod.SyntheticPairDataset = orig

    assert s_fused["steps"] == s_plain["steps"] == 2
    np.testing.assert_allclose(s_fused["last_val"]["circle_loss"],
                               s_plain["last_val"]["circle_loss"], rtol=1e-5)
    np.testing.assert_allclose(s_fused["last_val"]["loss"],
                               s_plain["last_val"]["loss"], rtol=1e-5)
    # the padded-tail pair-weighting must match too: compare the logged
    # train-epoch loss rows
    def epoch_losses(d):
        rows = [json.loads(l) for l in open(d / "metrics.jsonl")]
        return [r["loss"] for r in rows if r["phase"] == "train_epoch"]

    np.testing.assert_allclose(epoch_losses(tmp_path / "fused"),
                               epoch_losses(tmp_path / "plain"), rtol=1e-5)
