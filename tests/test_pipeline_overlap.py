"""Builder/trainer mesh pipeline (parallel/pipeline.py) — correctness on
the 8-virtual-device CPU mesh: the pipelined run must produce the same
training trajectory as serial data-parallel on the trainer submesh (the
build is deterministic; only WHERE it executes changes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.pipeline import collate_raw
from apr_tpu.data.synthetic import synthetic_pair
from apr_tpu.parallel import BuilderTrainerPipeline, make_mesh, replicate, \
    shard_batch
from apr_tpu.training import get_trainer

pytestmark = pytest.mark.slow

CFG = APRConfig(
    trainer="GenerativePairTrainer",
    model="ResUNetBN2",
    model_n_out=16,
    conv1_kernel_size=3,
    generator_model="GenerativeMLP_54",
    point_generation_ratio=2,
    batch_size=4,
    num_pos_per_batch=64,
    num_hn_samples_per_batch=32,
    voxel_size=1.0,
    point_capacity=1024,
    capacities=(512, 256, 128, 64),
    apc_capacity=1024,
    lr=0.05,
)


def _raw_batches(n):
    out = []
    for i in range(n):
        pairs = [synthetic_pair(4 * i + j, n_points=900, apc_points=900,
                                distance=8.0, extent=30.0)
                 for j in range(CFG.batch_size)]
        out.append(collate_raw(pairs, CFG))
    return out


def test_pipeline_matches_serial_dp():
    assert len(jax.devices()) >= 8
    trainer = get_trainer(CFG)
    raws = _raw_batches(3)
    batch0 = jax.jit(trainer.build_batch)(raws[0])
    state0 = trainer.init_state(jax.random.PRNGKey(0), batch0)

    # serial DP over the 4-device trainer submesh
    train_mesh = make_mesh(jax.devices()[:4])
    state_s = replicate(state0, train_mesh)
    key = jax.random.PRNGKey(7)
    ks = []
    k = key
    for _ in range(len(raws)):
        k, kk = jax.random.split(k)
        ks.append(kk)
    losses_s = []
    for raw, kk in zip(raws, ks):
        b = jax.jit(trainer.build_batch)(shard_batch(raw, train_mesh))
        state_s, m = trainer.train_step(state_s, b, kk)
        losses_s.append(float(m["loss"]))

    # pipelined: 4 trainers + 4 builders, same key schedule
    pipe = BuilderTrainerPipeline(trainer, n_builders=4,
                                  devices=jax.devices())
    state_p = pipe.replicate_state(state0)
    losses_p = []
    state_p = pipe.run(state_p, raws, key,
                       on_metrics=lambda m: losses_p.append(
                           float(m["loss"])))

    assert len(losses_p) == len(losses_s)
    np.testing.assert_allclose(losses_p, losses_s, rtol=1e-5)
    # parameter trajectories agree
    fs = jax.tree.leaves(state_s.params)
    fp = jax.tree.leaves(state_p.params)
    for a, b in zip(fs, fp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_pipeline_rejects_bad_split():
    trainer = get_trainer(CFG)
    with pytest.raises(ValueError):
        BuilderTrainerPipeline(trainer, n_builders=len(jax.devices()))


def test_loop_runs_with_mesh_pipeline(tmp_path):
    """run_training end-to-end with mesh_n_builders=4 on the CPU mesh."""
    import apr_tpu.data.datasets as dsmod
    from apr_tpu.training.loop import run_training

    cfg = CFG.replace(
        dataset="synthetic",
        pair_min_dist=4.0,
        pair_max_dist=8.0,
        out_dir=str(tmp_path / "out"),
        mesh_n_builders=4,
        max_epoch=1,
        stat_freq=1,
        val_epoch_freq=10,  # skip val
    )
    orig = dsmod.SyntheticPairDataset

    class Tiny(orig):
        def __init__(self, **kw):
            kw["num_pairs"] = 8 if kw.get("phase") == "train" else 2
            kw["n_points"] = 900
            kw["apc_points"] = 900
            kw["extent"] = 25.0
            super().__init__(**kw)

    dsmod.SyntheticPairDataset, saved = Tiny, orig
    try:
        summary = run_training(cfg, max_epochs=1)
    finally:
        dsmod.SyntheticPairDataset = saved
    assert summary["steps"] >= 2
    assert np.isfinite(summary["last_train"]["loss"])
