"""Multi-chip eval fan-out on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import synthetic_pair
from apr_tpu.eval import FeatureTester
from apr_tpu.parallel import make_mesh
from apr_tpu.training import get_trainer


@pytest.mark.slow
@pytest.mark.veryslow
def test_sharded_eval_matches_single(rng):
    cfg = APRConfig(
        trainer="GenerativePairTrainer", model="ResUNetBN2", model_n_out=16,
        conv1_kernel_size=3, generator_model="GenerativeMLP_54",
        point_generation_ratio=2, voxel_size=1.0,
        point_capacity=2048, capacities=(1024, 512, 256, 128),
        apc_capacity=8,
        test_num_ransac_hypotheses=1024, test_subsample=400,
    )
    trainer = get_trainer(cfg)
    pairs = [synthetic_pair(s, n_points=1800, apc_points=4, distance=5.0,
                            extent=25.0) for s in range(4)]
    tester = FeatureTester(cfg, trainer, None)
    b0 = tester._pair_to_batch(pairs[0])
    state = trainer.init_state(jax.random.PRNGKey(0), b0)
    tester.state = state

    mesh = make_mesh(jax.devices()[:4])
    stats = tester.test_sharded(pairs, mesh=mesh, seed=0)
    assert len(stats.rte) == 4
    assert all(np.isfinite(stats.rte))
    # every pair produced a plausible (finite, bounded) registration attempt
    assert all(r < 1000 for r in stats.rte)


@pytest.mark.slow
@pytest.mark.veryslow
def test_predator_sharded_eval(rng):
    from apr_tpu.eval.predator_tester import PredatorTester
    from apr_tpu.training.predator import PredatorTrainer

    cfg = APRConfig(
        trainer="PredatorTrainer",
        first_feats_dim=16, final_feats_dim=8, gnn_feats_dim=16,
        dgcnn_k=4, num_head=2, num_kernel_points=7,
        first_subsampling_dl=1.0, point_capacity=1024,
        kp_capacities=(512, 256, 128, 64),
        neighborhood_limits=(12, 12, 12, 12),
        test_num_ransac_hypotheses=512, test_subsample=200,
        point_generation_ratio=2, generator_model="GenerativeMLP_54",
    )
    trainer = PredatorTrainer(cfg)
    pairs = [synthetic_pair(s, n_points=900, apc_points=4, distance=4.0,
                            extent=20.0) for s in range(4)]
    tester = PredatorTester(cfg, trainer, None)
    b0 = tester._pair_to_batch(pairs[0])
    state = trainer.init_state(jax.random.PRNGKey(0), b0)
    tester.state = state

    mesh = make_mesh(jax.devices()[:4])
    stats = tester.test_sharded(pairs, mesh=mesh, seed=0)
    assert len(stats.rte) == 4
    assert all(np.isfinite(stats.rte))
    assert all(r < 1000 for r in stats.rte)


def test_sequence_parallel_chamfer_matches_single(rng):
    """Query-sharded Chamfer over the mesh == single-device, value AND grad."""
    from apr_tpu.ops.chamfer import chamfer_distance
    from apr_tpu.parallel.chamfer_sp import chamfer_distance_sp

    a = rng.uniform(-20, 20, (512, 3)).astype(np.float32)
    b = rng.uniform(-20, 20, (768, 3)).astype(np.float32)
    am = np.ones(512, bool); am[490:] = False
    bm = np.ones(768, bool); bm[700:] = False

    mesh = make_mesh(jax.devices()[:4])
    f_sp = chamfer_distance_sp(mesh)
    args = (jax.numpy.asarray(a), jax.numpy.asarray(b),
            jax.numpy.asarray(am), jax.numpy.asarray(bm))

    v_sp, (ga_sp, gb_sp) = jax.value_and_grad(f_sp, argnums=(0, 1))(*args)
    v_1, (ga_1, gb_1) = jax.value_and_grad(
        chamfer_distance, argnums=(0, 1))(*args)
    np.testing.assert_allclose(float(v_sp), float(v_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ga_sp), np.asarray(ga_1),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb_sp), np.asarray(gb_1),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sharded_eval_tier_grouping(rng):
    """test_capacity_buckets in the sharded path: mixed-size pairs form
    same-tier groups (input order preserved), every pair evaluated once."""
    cfg = APRConfig(
        trainer="GenerativePairTrainer", model="ResUNetBN2", model_n_out=16,
        conv1_kernel_size=3, generator_model="GenerativeMLP_54",
        point_generation_ratio=2, voxel_size=1.0,
        point_capacity=2048, capacities=(1024, 512, 256, 128),
        apc_capacity=8,
        test_num_ransac_hypotheses=1024, test_subsample=256,
        test_capacity_buckets=2,
    )
    trainer = get_trainer(cfg)
    # light, light, heavy, light: tier changes force a group break
    sizes = [250, 250, 1800, 250]
    pairs = [synthetic_pair(s, n_points=n, apc_points=4, distance=5.0,
                            extent=25.0) for s, n in enumerate(sizes)]
    tester = FeatureTester(cfg, trainer, None)
    b0 = tester._pair_to_batch(pairs[2])
    state = trainer.init_state(jax.random.PRNGKey(0), b0)
    tester.state = state

    mesh = make_mesh(jax.devices()[:2])
    stats = tester.test_sharded(pairs, mesh=mesh, seed=0)
    assert len(stats.rte) == 4
    assert all(np.isfinite(stats.rte))
    # order preserved: pair_dist matches the input order
    expect = [float(np.linalg.norm(p["t_gt"][:3, 3])) for p in pairs]
    np.testing.assert_allclose(stats.pair_dist, expect, rtol=1e-6)
