"""FeatureTester single-path smoke: pipelined and per-pair modes agree."""

import jax
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import synthetic_pair
from apr_tpu.eval import FeatureTester
from apr_tpu.training import get_trainer


@pytest.mark.slow
def test_tester_modes_agree(rng):
    cfg = APRConfig(
        trainer="GenerativePairTrainer", model="ResUNetBN2", model_n_out=16,
        conv1_kernel_size=3, generator_model="GenerativeMLP_54",
        point_generation_ratio=2, voxel_size=1.0,
        point_capacity=2048, capacities=(1024, 512, 256, 128),
        apc_capacity=8,
        test_num_ransac_hypotheses=512, test_subsample=300,
    )
    trainer = get_trainer(cfg)
    pairs = [synthetic_pair(s, n_points=1500, apc_points=4, distance=5.0,
                            extent=25.0) for s in range(3)]
    tester = FeatureTester(cfg, trainer, None)
    b0 = tester._pair_to_batch(pairs[0])
    state = trainer.init_state(jax.random.PRNGKey(0), b0)
    tester.state = state

    s_pipe = tester.test(pairs, seed=7, pipelined=True)
    s_sync = tester.test(pairs, seed=7, pipelined=False)
    np.testing.assert_allclose(s_pipe.rte, s_sync.rte, rtol=1e-5)
    np.testing.assert_allclose(s_pipe.rre, s_sync.rre, rtol=1e-4)
    assert s_pipe.success == s_sync.success
    assert len(s_pipe.rte) == 3
