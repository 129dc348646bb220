"""Occupancy-driven capacity bucketing (eval/bucketing.py).

The load-bearing property: with no level overflowing, the encoder's
valid-voxel features are CAPACITY-INDEPENDENT — the sorted-key voxel order
is the same prefix at every tier and the masked norms see only valid rows.
That makes tier selection recall-neutral by construction; these tests pin
the property plus the host-side selection logic and the tester wiring.
"""

import jax
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import synthetic_pair
from apr_tpu.eval.bucketing import (
    bucket_for_pair,
    select_divisor,
    voxel_occupancy,
)

CFG = APRConfig(
    trainer="GenerativePairTrainer",
    model="ResUNetBN2",
    model_n_out=16,
    conv1_kernel_size=3,
    generator_model="GenerativeMLP_54",
    point_generation_ratio=2,
    voxel_size=1.0,
    point_capacity=2048,
    capacities=(2048, 1024, 512, 256),
    apc_capacity=8,
    test_num_ransac_hypotheses=2048,
)


def test_select_divisor():
    # fits /4: occ and n_points both under a quarter of the budget
    assert select_divisor(900, 3000, 16384, 32768, max_tiers=2) == 4
    # occ blocks /4 but fits /2
    assert select_divisor(5000, 3000, 16384, 32768, max_tiers=2) == 2
    # n_points blocks any shrink
    assert select_divisor(900, 20000, 16384, 32768, max_tiers=2) == 1
    # max_tiers bounds the shrink
    assert select_divisor(10, 10, 16384, 32768, max_tiers=1) == 2
    assert select_divisor(10, 10, 16384, 32768, max_tiers=3) == 8
    # worst case always fits
    assert select_divisor(16384, 32768, 16384, 32768, max_tiers=2) == 1


def test_voxel_occupancy_and_pair_bucket():
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [1.5, 0.0, 0.0]],
                   np.float32)
    assert voxel_occupancy(pts, 1.0) == 2
    pair = dict(points0=pts, points1=pts)
    pc, caps = bucket_for_pair(pair, 1.0, (64, 32, 16, 8), 128, max_tiers=2)
    assert pc == 32 and caps == (16, 8, 4, 2)
    assert voxel_occupancy(np.zeros((0, 3)), 1.0) == 0


@pytest.fixture(scope="module")
def trainer_state():
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer

    trainer = get_trainer(CFG)
    tester = FeatureTester(CFG, trainer, None)
    pair = synthetic_pair(seed=3, n_points=800, apc_points=4, distance=6.0,
                          extent=20.0)
    batch = tester._pair_to_batch(pair)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    tester.state = state
    return trainer, tester, state, pair


def test_feature_invariance_across_tiers(trainer_state):
    """Same pair, full vs half capacities: identical valid-voxel sets and
    (to float tolerance) identical features."""
    trainer, tester, state, pair = trainer_state
    b_full = tester._pair_to_batch(pair)
    b_half = tester._pair_to_batch(
        pair, point_capacity=1024, capacities=(1024, 512, 256, 128))

    f_full, _, _ = trainer._encode_pair(
        state.params, state.batch_stats, b_full, False)
    f_half, _, _ = trainer._encode_pair(
        state.params, state.batch_stats, b_half, False)
    m_full = np.asarray(b_full.pyramid0.levels[0].mask[0])
    m_half = np.asarray(b_half.pyramid0.levels[0].mask[0])
    n = m_full.sum()
    assert n == m_half.sum() > 400  # same voxels survive at both tiers
    # sorted-key order => the half-tier buffer is a prefix-compatible layout
    np.testing.assert_array_equal(
        np.asarray(b_full.pyramid0.levels[0].keys[0])[:n],
        np.asarray(b_half.pyramid0.levels[0].keys[0])[:n])
    np.testing.assert_allclose(
        np.asarray(f_full[0])[:n], np.asarray(f_half[0])[:n],
        rtol=2e-2, atol=2e-3)  # bf16 compute path; reduction-order noise


def test_tester_bucketed_end_to_end(trainer_state):
    """test_capacity_buckets routes small pairs through a shrunken program
    and the eval stays finite; tier selection actually fires."""
    trainer, _, state, pair = trainer_state
    from apr_tpu.eval import FeatureTester

    cfg = CFG.replace(test_capacity_buckets=2)
    pc, caps = bucket_for_pair(
        pair, cfg.voxel_size, cfg.capacities, cfg.point_capacity,
        max_tiers=2)
    assert caps[0] < cfg.capacities[0]  # the small pair picked a lower tier

    tester = FeatureTester(cfg, trainer, state)
    stats = tester.test([pair, pair], pipelined=False)
    assert len(stats.rte) == 2
    assert all(np.isfinite(stats.rte))

    # bucketed batch really is the shrunken shape
    b = tester._bucketed_batch(pair)
    assert b.pyramid0.levels[0].keys.shape[1] == caps[0]


@pytest.mark.slow
def test_predator_bucketed_smoke():
    """KP-flavor bucketing: a light pair routes through a halved-capacity
    pyramid and the eval stays finite."""
    from apr_tpu.eval.predator_tester import PredatorTester
    from apr_tpu.training.predator import PredatorTrainer

    cfg = APRConfig(
        trainer="PredatorTrainer",
        final_feats_dim=8,
        first_feats_dim=16,
        gnn_feats_dim=16,
        dgcnn_k=4,
        num_head=2,
        num_kernel_points=15,
        first_subsampling_dl=1.5,
        generator_model="GenerativeMLP_4",
        point_generation_ratio=2,
        point_capacity=1024,
        apc_capacity=8,
        kp_capacities=(512, 128, 48, 16),
        neighborhood_limits=(16, 16, 16, 16),
        max_points=128,
        test_num_ransac_hypotheses=1024,
        test_subsample=256,
        test_capacity_buckets=1,
    )
    trainer = PredatorTrainer(cfg)
    pair = synthetic_pair(seed=5, n_points=220, apc_points=4, distance=6.0,
                          extent=20.0)
    tester = PredatorTester(cfg, trainer, None)
    b = tester._bucketed_batch(pair)
    assert b.pyr0.levels[0].points.shape[0] == 256  # halved tier selected
    state = trainer.init_state(jax.random.PRNGKey(0), b)
    tester.state = state
    stats = tester.test([pair], pipelined=False)
    assert len(stats.rte) == 1 and np.isfinite(stats.rte[0])


class _MixedSizeDataset:
    """Alternating light/heavy synthetic pairs to exercise tier batching."""

    def __init__(self, n=8):
        self.n = n

    def __len__(self):
        return self.n

    def get_pair(self, i):
        n_pts = 250 if i % 2 == 0 else 1400
        return synthetic_pair(seed=i, n_points=n_pts, apc_points=4,
                              distance=6.0, extent=20.0)


def test_train_loader_bucketed_batches():
    """PairLoader with train_capacity_buckets groups pairs into uniform
    capacity tiers; light batches come out in shrunken buffers."""
    from apr_tpu.data.pipeline import PairLoader

    cfg = CFG.replace(train_capacity_buckets=2, batch_size=2,
                      apc_capacity=8)
    loader = PairLoader(_MixedSizeDataset(8), cfg, shuffle=False,
                        drop_last=True)
    sizes = []
    n_pairs = 0
    for batch in loader:
        c0 = batch.pyramid0.levels[0].keys.shape[1]
        assert batch.batch_size == 2
        sizes.append(c0)
        n_pairs += batch.batch_size
    assert n_pairs == 8
    # both tiers appeared: the light pairs shrank, the heavy ones did not
    assert min(sizes) < max(sizes)
    assert max(sizes) == CFG.capacities[0]

    # raw mode (fused/pipeline paths) ignores bucketing
    raw_loader = PairLoader(_MixedSizeDataset(4), cfg, shuffle=False,
                            raw=True)
    assert raw_loader.bucket_tiers == 0


@pytest.mark.slow
def test_train_steps_across_tiers(trainer_state):
    """Two train steps at different capacity tiers share one TrainState
    (params are shape-independent) and both stay finite."""
    from apr_tpu.data.pipeline import PairLoader
    from apr_tpu.training import get_trainer

    cfg = CFG.replace(
        train_capacity_buckets=2, batch_size=2, apc_capacity=2048,
        num_pos_per_batch=64, num_hn_samples_per_batch=32)
    trainer = get_trainer(cfg)
    loader = PairLoader(_MixedSizeDataset(4), cfg, shuffle=False,
                        drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert (batches[0].pyramid0.levels[0].keys.shape[1]
            != batches[1].pyramid0.levels[0].keys.shape[1])
    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    for i, b in enumerate(batches):
        state, m = trainer.train_step(state, b, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
