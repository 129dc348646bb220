"""Flagship-shape sharding compiles (round-2 verdict weak-item 7).

The driver dryrun proves SPMD mechanics at toy scale (768-pt buffers).  This
slow-tier test compiles the FCGF train step at the BENCHMARK shapes — 32k-pt
clouds, (16384, 8192, 4096, 2048) pyramid capacities, model_n_out 128, one
pair per device — sharded over a 2-device CPU mesh, via AOT
``lower(...).compile()``: the GSPMD partitioner must produce an executable
for the real shardings without OOM or partitioning errors.  Execution is
skipped (a CPU step at this scale takes minutes and proves nothing extra
about sharding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import pad_points, synthetic_pair
from apr_tpu.parallel import make_mesh, replicate, shard_batch
from apr_tpu.training import get_trainer
from apr_tpu.training.batching import make_pair_batch

pytestmark = [pytest.mark.slow, pytest.mark.veryslow]

N_DEV = 2


@pytest.mark.skipif(len(jax.devices()) < N_DEV, reason="needs 2 devices")
def test_flagship_train_step_shards_and_compiles():
    cfg = APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetFatBN",
        model_n_out=128,
        conv1_kernel_size=5,
        voxel_size=0.3,
        batch_size=N_DEV,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=32768,
    )
    trainer = get_trainer(cfg)

    cols = [[] for _ in range(9)]
    for s in range(N_DEV):
        d = synthetic_pair(s, n_points=4000, apc_points=4000, distance=10.0,
                           extent=60.0)
        p0, m0 = pad_points(d["points0"], cfg.point_capacity)
        p1, m1 = pad_points(d["points1"], cfg.point_capacity)
        a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
        a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
        for col, v in zip(cols, (p0, m0, p1, m1, a0, am0, a1, am1,
                                 d["t_gt"].astype(np.float32))):
            col.append(v)
    arrs = [jnp.asarray(np.stack(c)) for c in cols]
    batch = make_pair_batch(
        *arrs,
        voxel_size=cfg.voxel_size,
        capacities=cfg.capacities,
        conv1_kernel_size=cfg.conv1_kernel_size,
        corr_cap=cfg.corr_capacity_per_point,
        search_multiplier=cfg.positive_pair_search_voxel_size_multiplier,
    )

    mesh = make_mesh(jax.devices()[:N_DEV])
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)

    # AOT: trace + GSPMD-partition + compile at the real shardings
    lowered = type(trainer).train_step.lower(
        trainer, state, batch, jax.random.PRNGKey(1))
    exe = lowered.compile()
    assert exe is not None
