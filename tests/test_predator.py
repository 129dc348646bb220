import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import pad_points, synthetic_pair
from apr_tpu.training.predator import (
    KPPairBatch,
    PredatorTrainer,
    make_kp_pair_batch,
)

pytestmark = pytest.mark.slow  # heavy tier: full models / train loops


CFG = APRConfig(
    trainer="PredatorTrainer",
    final_feats_dim=16,
    first_feats_dim=32,
    gnn_feats_dim=32,
    generator_model="GenerativeMLP_54",
    point_generation_ratio=2,
    first_subsampling_dl=1.0,
    conv_radius=2.5,
    kp_capacities=(1024, 512, 256, 128),
    neighborhood_limits=(16, 16, 16, 16),
    point_capacity=3000,
    apc_capacity=2048,
    pos_radius=1.0,
    safe_radius=2.5,
    overlap_radius=1.2,
    matchability_radius=1.2,
    max_points=128,
    optimizer="SGD",
    lr=0.01,
    sgd_momentum=0.98,
)


def _make_batch(cfg, seed=0):
    d = synthetic_pair(seed, n_points=2500, apc_points=2000, distance=8.0,
                       extent=30.0)
    p0, m0 = pad_points(d["points0"], cfg.point_capacity)
    p1, m1 = pad_points(d["points1"], cfg.point_capacity)
    a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
    a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
    return make_kp_pair_batch(
        jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
        jnp.asarray(a0), jnp.asarray(am0), jnp.asarray(a1), jnp.asarray(am1),
        jnp.asarray(d["t_gt"]),
        first_subsampling_dl=cfg.first_subsampling_dl,
        conv_radius=cfg.conv_radius,
        capacities=cfg.kp_capacities,
        neighbor_limits=cfg.neighborhood_limits,
        overlap_radius=cfg.overlap_radius,
    )


@pytest.fixture(scope="module")
def setup():
    trainer = PredatorTrainer(CFG)
    batch = _make_batch(CFG)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, batch, state


def test_kp_batch_correspondences(setup):
    _, batch, _ = setup
    assert int(jnp.sum(batch.corr_mask)) > 50
    n0 = int(jnp.sum(batch.pyr0.levels[0].mask))
    assert n0 > 100


@pytest.mark.veryslow
def test_predator_train_step(setup):
    trainer, batch, state = setup
    state2, metrics = trainer.train_step(
        state, batch, jax.random.PRNGKey(1), jnp.asarray(0.0)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(metrics["skipped_nonfinite"]) == 0.0
    diff = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))),
        jax.tree.map(lambda a, b: a - b, state.params, state2.params),
        0.0,
    )
    assert diff > 0


def test_predator_loss_decreases(setup):
    trainer, batch, state = setup
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(6):
        key, k = jax.random.split(key)
        state, m = trainer.train_step(state, batch, k, jnp.asarray(0.0))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_predator_valid_and_saliency_toggle(setup):
    trainer, batch, state = setup
    m0 = trainer.valid_step(state, batch, jax.random.PRNGKey(3),
                            jnp.asarray(0.0))
    m1 = trainer.valid_step(state, batch, jax.random.PRNGKey(3),
                            jnp.asarray(1.0))
    # saliency weight only changes the total loss, not its components
    np.testing.assert_allclose(
        float(m0["circle_loss"]), float(m1["circle_loss"]), rtol=1e-5
    )
    assert float(m1["loss"]) != float(m0["loss"])


def test_predator_tester_runs(setup):
    from apr_tpu.eval.predator_tester import PredatorTester

    trainer, batch, state = setup
    cfg = CFG.replace(test_num_ransac_hypotheses=1024, test_subsample=500)
    tester = PredatorTester(cfg, trainer, state)
    d = [synthetic_pair(7, n_points=2500, apc_points=4, distance=6.0,
                        extent=30.0)]
    stats = tester.test(d)
    assert len(stats.rte) == 1
    assert np.isfinite(stats.rte[0])
