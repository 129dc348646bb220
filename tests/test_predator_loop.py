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

    # data-parallel loop: 4 pairs on an 8-device mesh = ONE padded group
    assert summary["steps"] == 1
    assert np.isfinite(summary["last_val"]["circle_loss"])
    out = tmp_path / "run"
    assert (out / "config.json").exists()
    lines = [json.loads(l) for l in open(out / "metrics.jsonl")]
    assert any(r["phase"] == "val" for r in lines)
    assert os.path.isdir(out / "checkpoints")


def _tiny_trainer_and_pairs(n_pairs=2):
    import jax
    import jax.numpy as jnp

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.training.predator import PredatorTrainer, make_kp_pair_batch

    cfg = APRConfig(
        trainer="PredatorTrainer",
        # f32: the exact-equality tests below (padded-4 == honest-2) compare
        # DIFFERENT batch shapes of the same math; bf16 matmul tiling rounds
        # differently per batch size, which is not what they test
        compute_dtype="float32",
        final_feats_dim=8, first_feats_dim=16, gnn_feats_dim=16,
        dgcnn_k=4, num_head=2,
        generator_model="GenerativeMLP_4", point_generation_ratio=2,
        first_subsampling_dl=1.5, conv_radius=2.5,
        kp_capacities=(384, 128, 48, 16), neighborhood_limits=(12, 12, 12, 12),
        point_capacity=640, apc_capacity=640,
        pos_radius=1.0, safe_radius=2.5, overlap_radius=1.5,
        matchability_radius=1.2, max_points=64,
    )
    trainer = PredatorTrainer(cfg)

    def one_pair(seed):
        d = synthetic_pair(seed, n_points=400, apc_points=400, distance=6.0,
                           extent=25.0)
        p0, m0 = pad_points(d["points0"], cfg.point_capacity)
        p1, m1 = pad_points(d["points1"], cfg.point_capacity)
        a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
        a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
        return make_kp_pair_batch(
            jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
            jnp.asarray(a0), jnp.asarray(am0), jnp.asarray(a1),
            jnp.asarray(am1), jnp.asarray(d["t_gt"]),
            first_subsampling_dl=cfg.first_subsampling_dl,
            conv_radius=cfg.conv_radius,
            capacities=cfg.kp_capacities,
            neighbor_limits=cfg.neighborhood_limits,
            overlap_radius=cfg.overlap_radius,
        )

    pairs = [one_pair(s) for s in range(n_pairs)]
    return trainer, cfg, pairs


@pytest.mark.slow
@pytest.mark.veryslow
def test_predator_batched_step_matches_per_pair_mean():
    """Per-device (vmapped) loss == mean of single-pair losses, and the
    sharded batched step runs green on the 8-device CPU mesh."""
    import jax
    import jax.numpy as jnp

    from apr_tpu.parallel import make_mesh, replicate, shard_batch

    trainer, cfg, pairs = _tiny_trainer_and_pairs(n_pairs=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pairs[0])
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    w = jnp.asarray(0.0)

    m0 = trainer.valid_step(state, pairs[0], keys[0], w)
    m1 = trainer.valid_step(state, pairs[1], keys[1], w)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pairs)
    mb = trainer.valid_step_batched(state, stacked, keys, w)
    want = 0.5 * (float(m0["loss"]) + float(m1["loss"]))
    np.testing.assert_allclose(float(mb["loss"]), want, rtol=2e-5, atol=1e-6)

    # sharded over the full CPU mesh: same program, one pair per device
    mesh = make_mesh()
    d = len(mesh.devices.reshape(-1))
    trainer8, cfg8, pairs8 = _tiny_trainer_and_pairs(n_pairs=d)
    state8 = trainer8.init_state(jax.random.PRNGKey(0), pairs8[0])
    state8 = replicate(state8, mesh)
    big = jax.tree.map(lambda *xs: jnp.stack(xs), *pairs8)
    big = shard_batch(big, mesh)
    keys8 = jax.random.split(jax.random.PRNGKey(2), d)
    new_state, metrics = trainer8.train_step_batched(state8, big, keys8, w)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0
    # params moved
    delta = jax.tree_util.tree_reduce(
        lambda acc, t: acc + float(jnp.abs(t).sum()),
        jax.tree.map(lambda a, b: a - b, new_state.params, state8.params),
        0.0,
    )
    assert delta > 0.0


@pytest.mark.slow
@pytest.mark.veryslow
def test_padded_tail_pairs_contribute_zero_gradient():
    """The train loop repetition-pads ragged tail groups
    (predator_loop._group_iter) and zero-weights the pads
    (predator_loop.py:147-153).  A padded 4-group with weights
    (.5,.5,0,0) must produce the SAME loss and post-step params as the
    honest 2-pair group — i.e. pads bias neither gradients nor metrics."""
    import jax
    import jax.numpy as jnp

    trainer, cfg, pairs = _tiny_trainer_and_pairs(n_pairs=2)
    state = trainer.init_state(jax.random.PRNGKey(0), pairs[0])
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    w = jnp.asarray(0.0)

    stacked4 = jax.tree.map(lambda *xs: jnp.stack(xs), pairs[0], pairs[1],
                            pairs[1], pairs[1])
    pw = jnp.asarray([0.5, 0.5, 0.0, 0.0])
    st_a, m_a = trainer.train_step_batched(state, stacked4, keys, w, pw)

    stacked2 = jax.tree.map(lambda *xs: jnp.stack(xs), pairs[0], pairs[1])
    st_b, m_b = trainer.train_step_batched(state, stacked2, keys[:2], w)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5, atol=1e-7)
    max_delta = jax.tree_util.tree_reduce(
        lambda acc, t: max(acc, float(jnp.abs(t).max())),
        jax.tree.map(lambda a, b: a - b, st_a.params, st_b.params), 0.0)
    assert max_delta < 1e-6, max_delta

    # and the weights actually flow: uniform weights over the padded group
    # (counting the repeated pair 3x) give a DIFFERENT loss
    _, m_c = trainer.train_step_batched(
        state, stacked4, keys, w, jnp.full((4,), 0.25))
    assert abs(float(m_c["loss"]) - float(m_b["loss"])) > 1e-6


@pytest.mark.slow
@pytest.mark.veryslow  # ~3 min: full calibration pre-pass + training
def test_calibrate_neighbors_wired_into_training(tmp_path, monkeypatch):
    """Reference Predator_APR/main.py:94-111 calibrates neighbor caps on the
    train set and feeds them to every loader.  When the config does not pin
    limits, run_predator_training must calibrate BEFORE building batches and
    the pyramid build must use the calibrated caps."""
    import json

    import apr_tpu.data.datasets as dsmod
    from apr_tpu.config import APRConfig
    from apr_tpu.training.predator_loop import run_predator_training

    cfg = APRConfig(
        trainer="PredatorTrainer",
        dataset="synthetic",
        final_feats_dim=8, first_feats_dim=16, gnn_feats_dim=16,
        dgcnn_k=4, num_head=2,
        generator_model="GenerativeMLP_4", point_generation_ratio=2,
        first_subsampling_dl=1.0, conv_radius=2.5,
        kp_capacities=(1024, 512, 256, 128),
        neighborhood_limits=(40, 40, 40, 40),
        neighborhood_limits_pinned=False,
        point_capacity=2500, apc_capacity=1024,
        pos_radius=1.0, safe_radius=2.5, overlap_radius=1.2,
        matchability_radius=1.2, max_points=64,
        pair_min_dist=4.0, pair_max_dist=8.0,
        out_dir=str(tmp_path / "run"),
    )

    orig = dsmod.SyntheticPairDataset

    class Tiny(orig):
        def __init__(self, **kw):
            kw["num_pairs"] = 2
            kw["n_points"] = 2000  # dense at dl=1.0 within extent 20
            kw["apc_points"] = 500
            kw["extent"] = 20.0
            super().__init__(**kw)

    seen = {}
    import apr_tpu.training.predator as predmod

    real_make = predmod.make_kp_pair_batch

    def spy_make(*args, **kw):
        seen["neighbor_limits"] = kw.get("neighbor_limits")
        return real_make(*args, **kw)

    monkeypatch.setattr(dsmod, "SyntheticPairDataset", Tiny)
    import apr_tpu.training.predator_loop as loopmod

    monkeypatch.setattr(loopmod, "make_kp_pair_batch", spy_make)
    summary = run_predator_training(cfg, max_epochs=1)

    # dense 2000-pt clouds at dl=1.0 / r=2.5: true neighbor counts are well
    # below the (40,...) default, so the 80th-percentile caps must tighten
    assert cfg.neighborhood_limits != (40, 40, 40, 40)
    assert max(cfg.neighborhood_limits) < 40
    # ... and the pyramid build actually consumed the calibrated caps
    assert seen["neighbor_limits"] == tuple(cfg.neighborhood_limits)
    # calibrated caps are persisted for test-time rehydration
    saved = json.load(open(tmp_path / "run" / "config.json"))
    assert tuple(saved["neighborhood_limits"]) == cfg.neighborhood_limits
    assert np.isfinite(summary["last_val"]["circle_loss"])
