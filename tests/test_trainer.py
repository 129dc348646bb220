import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import synthetic_pair, pad_points
from apr_tpu.training import get_trainer, make_pair_batch

pytestmark = pytest.mark.slow  # heavy tier: full models / train loops



CFG = APRConfig(
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


def _make_batch(cfg, seeds=(0, 1)):
    p0s, m0s, p1s, m1s, a0s, am0s, a1s, am1s, ts = [], [], [], [], [], [], [], [], []
    for s in seeds:
        d = synthetic_pair(s, n_points=2000, apc_points=2000, distance=8.0,
                           extent=30.0)
        p0, m0 = pad_points(d["points0"], cfg.point_capacity)
        p1, m1 = pad_points(d["points1"], cfg.point_capacity)
        a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
        a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
        p0s.append(p0); m0s.append(m0); p1s.append(p1); m1s.append(m1)
        a0s.append(a0); am0s.append(am0); a1s.append(a1); am1s.append(am1)
        ts.append(d["t_gt"])
    stack = lambda xs: jnp.asarray(np.stack(xs))
    return make_pair_batch(
        stack(p0s), stack(m0s), stack(p1s), stack(m1s),
        stack(a0s), stack(am0s), stack(a1s), stack(am1s), stack(ts),
        voxel_size=cfg.voxel_size,
        capacities=cfg.capacities,
        conv1_kernel_size=cfg.conv1_kernel_size,
        corr_cap=cfg.corr_capacity_per_point,
        search_multiplier=cfg.positive_pair_search_voxel_size_multiplier,
    )


@pytest.fixture(scope="module")
def trainer_and_batch():
    trainer = get_trainer(CFG)
    batch = _make_batch(CFG)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, batch, state


def test_batch_has_positive_pairs(trainer_and_batch):
    _, batch, _ = trainer_and_batch
    n_pos = int(jnp.sum(batch.pos_mask))
    assert n_pos > 100, n_pos  # overlapping region must yield GT matches
    n_vox = int(jnp.sum(batch.pyramid0.levels[0].mask))
    assert n_vox > 200


def test_train_step_runs_and_is_finite(trainer_and_batch):
    trainer, batch, state = trainer_and_batch
    state2, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["skipped_nonfinite"]) == 0.0
    assert int(state2.step) == 1
    # params actually changed
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, state.params, state2.params),
        0.0,
    )
    assert diff > 0


def test_loss_decreases_over_steps(trainer_and_batch):
    trainer, batch, state = trainer_and_batch
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(8):
        key, k = jax.random.split(key)
        state, metrics = trainer.train_step(state, batch, k)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_valid_step_metrics(trainer_and_batch):
    trainer, batch, state = trainer_and_batch
    metrics = trainer.valid_step(state, batch, jax.random.PRNGKey(3))
    for k in ("loss", "hit_ratio", "rte", "rre", "success", "feat_match_ratio"):
        assert k in metrics
        assert np.isfinite(float(metrics[k])), k


def test_lr_schedule(trainer_and_batch):
    trainer, batch, state = trainer_and_batch
    s1 = trainer.set_lr(state, 10)
    expected = CFG.lr * CFG.exp_gamma ** 10
    np.testing.assert_allclose(float(s1.lr), expected, rtol=1e-6)
    # a step with the new lr still works
    _, metrics = trainer.train_step(s1, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(tmp_path, trainer_and_batch):
    from apr_tpu.training.checkpoints import CheckpointManager

    trainer, batch, state = trainer_and_batch
    state2, _ = trainer.train_step(state, batch, jax.random.PRNGKey(5))
    mngr = CheckpointManager(str(tmp_path))
    mngr.save(1, state2, extra={"best_val": 0.5})
    restored, meta = mngr.restore(state)
    assert meta["epoch"] == 1
    assert meta["best_val"] == 0.5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state2.params, restored.params,
    )
    w_only, _ = mngr.restore_weights_only(state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state2.params, w_only.params,
    )


def test_best_checkpoint_survives_gc(tmp_path, trainer_and_batch):
    """Tagged 'best' snapshots must outlive max_to_keep rolling saves — the
    reference keeps best_val_checkpoint.pth / model_best_recall.pth forever."""
    from apr_tpu.training.checkpoints import CheckpointManager

    trainer, batch, state = trainer_and_batch
    mngr = CheckpointManager(str(tmp_path), max_to_keep=3)
    mngr.save(1, state, extra={"best_val": 0.9}, tag="best")
    for epoch in range(2, 8):  # 6 rolling saves > max_to_keep
        mngr.save(epoch, state)
    restored, meta = mngr.restore(state, tag="best")
    assert meta["epoch"] == 1
    assert meta["best_val"] == 0.9
    # rolling saves were GC'd down to 3
    assert mngr.latest_epoch() == 7


def test_encode_pair_fold_matches_separate(trainer_and_batch):
    """The eval-mode 2B fold must be bit-identical to two separate encodes
    (running-stats BN has no cross-element coupling)."""
    trainer, batch, state = trainer_and_batch
    f0s, _ = trainer._encode(state.params, state.batch_stats, batch.feats0,
                             batch.pyramid0, False)
    f1s, _ = trainer._encode(state.params, state.batch_stats, batch.feats1,
                             batch.pyramid1, False)
    f0, f1, _ = trainer._encode_pair(state.params, state.batch_stats,
                                     batch, False)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f0s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f1s), atol=1e-6)


def test_encode_pair_train_fold_matches_sequential(trainer_and_batch):
    """Train-mode fold (stats_groups=2 BN) must reproduce the reference's
    two sequential forwards: same features AND same updated batch stats
    (per-side moments, in-order momentum updates)."""
    trainer, batch, state = trainer_and_batch
    f0s, f1s, stats_seq = trainer._encode_pair(
        state.params, state.batch_stats, batch, True, fold=False)
    f0, f1, stats_fold = trainer._encode_pair(
        state.params, state.batch_stats, batch, True, fold=True)
    np.testing.assert_allclose(np.asarray(f0), np.asarray(f0s),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f1s),
                               atol=2e-5, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        stats_fold, stats_seq,
    )
