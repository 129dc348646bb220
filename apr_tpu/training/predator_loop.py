"""Predator-path training loop (reference Predator_APR/lib/trainer.py:283-385).

Per epoch: iterate pairs (batch of one), train_step, LR step, validation with
circle-loss / recall tracking, ``model_best_loss`` / ``model_best_recall``
snapshots, and the saliency-weight toggle: once validation feature-match
recall exceeds 0.3, w_saliency flips from 0 to 1 (trainer.py:370-374).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.datasets import make_dataset
from apr_tpu.data.synthetic import pad_points
from apr_tpu.training.checkpoints import CheckpointManager
from apr_tpu.training.loop import MetricsLogger
from apr_tpu.training.predator import PredatorTrainer, make_kp_pair_batch
from apr_tpu.utils.timer import AverageMeter, Timer

log = logging.getLogger(__name__)


def pair_to_kp_batch(pair, config: APRConfig):
    import jax.numpy as jnp

    p0, m0 = pad_points(pair["points0"], config.point_capacity)
    p1, m1 = pad_points(pair["points1"], config.point_capacity)
    a0, am0 = pad_points(pair["apc0"], config.apc_capacity)
    a1, am1 = pad_points(pair["apc1"], config.apc_capacity)
    return make_kp_pair_batch(
        jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
        jnp.asarray(a0), jnp.asarray(am0), jnp.asarray(a1), jnp.asarray(am1),
        jnp.asarray(pair["t_gt"]),
        first_subsampling_dl=config.first_subsampling_dl,
        conv_radius=config.conv_radius,
        capacities=config.kp_capacities,
        neighbor_limits=config.neighborhood_limits,
        overlap_radius=config.overlap_radius,
    )


def _batch_iter(dataset, indices, config: APRConfig, prefetch: int = 2):
    """Background-thread batch assembly: batch i+1's file reads + padding +
    device-side pyramid build overlap batch i's train step (shared
    machinery: apr_tpu.data.pipeline.prefetched)."""
    from apr_tpu.data.pipeline import prefetched

    yield from prefetched(
        indices,
        lambda i: pair_to_kp_batch(dataset.get_pair(int(i)), config),
        prefetch,
    )


def run_predator_training(config: APRConfig,
                          max_epochs: Optional[int] = None) -> Dict:
    os.makedirs(config.out_dir, exist_ok=True)
    config.save_json(os.path.join(config.out_dir, "config.json"))

    trainer = PredatorTrainer(config)
    train_ds = make_dataset(config, "train")
    val_ds = make_dataset(config, "val")

    key = jax.random.PRNGKey(config.seed)
    sample = pair_to_kp_batch(train_ds.get_pair(0), config)
    state = trainer.init_state(key, sample)

    mngr = CheckpointManager(config.out_dir)
    metrics_log = MetricsLogger(config.out_dir)

    start_epoch = 0
    w_saliency = float(config.w_saliency_loss)
    best_loss, best_recall = 1e5, -1e5
    if config.resume is not None and os.path.isdir(config.resume):
        rm = CheckpointManager(config.resume)
        if rm.latest_epoch() is not None:
            state, meta = rm.restore(state)
            start_epoch = int(meta["epoch"])
            w_saliency = float(meta.get("w_saliency", w_saliency))
            best_loss = float(meta.get("best_loss", best_loss))
            best_recall = float(meta.get("best_recall", best_recall))

    epochs = max_epochs or config.max_epoch
    rng = np.random.default_rng(config.seed)
    step = int(state.step)
    summary: Dict = {}

    for epoch in range(start_epoch, epochs):
        state = trainer.set_lr(state, epoch)
        order = rng.permutation(len(train_ds))
        meters: Dict[str, AverageMeter] = {}
        timer = Timer()
        # deferred metric reads: float(step k-1's metrics) AFTER dispatching
        # step k — no per-step device sync (same pattern as loop.py)
        pending = None
        for batch in _batch_iter(train_ds, order, config):
            key, k = jax.random.split(key)
            timer.tic()
            state, m = trainer.train_step(state, batch, k,
                                          jnp.asarray(w_saliency))
            if pending is not None:
                for name, v in pending.items():
                    meters.setdefault(name, AverageMeter()).update(float(v))
            pending = m
            timer.toc()
            step += 1
            if step % config.stat_freq == 0 and meters:
                scalars = {k_: mt.avg for k_, mt in meters.items()}
                scalars["step_time"] = timer.avg
                metrics_log.write("train", step, scalars)
                log.info("epoch %d step %d loss %.4f (%.2fs/it)",
                         epoch, step, meters["loss"].avg, timer.avg)
        if pending is not None:
            for name, v in pending.items():
                meters.setdefault(name, AverageMeter()).update(float(v))

        # validation
        vmeters: Dict[str, AverageMeter] = {}
        for batch in _batch_iter(val_ds, range(len(val_ds)), config):
            key, k = jax.random.split(key)
            vm = trainer.valid_step(state, batch, k, jnp.asarray(w_saliency))
            for name, v in vm.items():
                vmeters.setdefault(name, AverageMeter()).update(float(v))
        vs = {k_: mt.avg for k_, mt in vmeters.items()}
        metrics_log.write("val", epoch, vs)
        log.info("val epoch %d: %s", epoch,
                 {k_: round(v, 4) for k_, v in vs.items()})

        # snapshots: best circle loss / best recall (trainer.py:359-368)
        extra = dict(w_saliency=w_saliency, best_loss=best_loss,
                     best_recall=best_recall)
        if vs.get("circle_loss", 1e9) < best_loss:
            best_loss = vs["circle_loss"]
            extra["best_loss"] = best_loss
            mngr.save(epoch + 1, state, extra=extra, tag="best_loss")
        if vs.get("recall", -1e9) > best_recall:
            best_recall = vs["recall"]
            extra["best_recall"] = best_recall
            mngr.save(epoch + 1, state, extra=extra, tag="best_recall")
        mngr.save(epoch + 1, state, extra=extra)

        # saliency toggle (trainer.py:370-374): a ONE-WAY latch in the
        # reference — once val recall exceeds 0.3 the saliency loss stays
        # on (and a nonzero configured w_saliency_loss is never clobbered)
        if vs.get("recall", 0.0) > 0.3:
            w_saliency = max(w_saliency, 1.0)
        summary["last_val"] = vs

    summary["steps"] = step
    summary["best_loss"] = best_loss
    summary["best_recall"] = best_recall
    return summary
