"""Predator-path training loop (reference Predator_APR/lib/trainer.py:283-385).

Per epoch: iterate pairs, train_step, LR step, validation with circle-loss /
recall tracking, ``model_best_loss`` / ``model_best_recall`` snapshots, and
the saliency-weight toggle: once validation feature-match recall exceeds 0.3,
w_saliency flips from 0 to 1 (trainer.py:370-374).

Data-parallel over ICI (SURVEY.md §2.4): the reference trains single-GPU with
batch_size 1 (dataloader.py:76); here each step stacks one pair per mesh
device on a leading axis, shards the stack (GSPMD inserts the gradient
all-reduce), and the host prefetch pipeline assembles the next group while
the device steps.
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
from apr_tpu.parallel import make_mesh, replicate, shard_batch
from apr_tpu.training.checkpoints import CheckpointManager
from apr_tpu.training.loop import MetricsLogger
from apr_tpu.training.predator import PredatorTrainer, make_kp_pair_batch
from apr_tpu.utils.timer import AverageMeter, Timer

log = logging.getLogger(__name__)


def pair_to_raw(pair, config: APRConfig):
    """One pair dict -> the nine padded numpy arrays make_kp_pair_batch
    consumes (host work only)."""
    p0, m0 = pad_points(pair["points0"], config.point_capacity)
    p1, m1 = pad_points(pair["points1"], config.point_capacity)
    a0, am0 = pad_points(pair["apc0"], config.apc_capacity)
    a1, am1 = pad_points(pair["apc1"], config.apc_capacity)
    return (p0, m0, p1, m1, a0, am0, a1, am1,
            pair["t_gt"].astype(np.float32))


def pair_to_kp_batch(pair, config: APRConfig):
    raw = pair_to_raw(pair, config)
    return make_kp_pair_batch(
        *[jnp.asarray(v) for v in raw],
        first_subsampling_dl=config.first_subsampling_dl,
        conv_radius=config.conv_radius,
        capacities=config.kp_capacities,
        neighbor_limits=config.neighborhood_limits,
        overlap_radius=config.overlap_radius,
    )


def _group_iter(dataset, indices, config: APRConfig, group: int, mesh,
                prefetch: int = 2, pad_tail: bool = True, raw: bool = False):
    """Background-thread assembly of ``group``-pair stacked batches: group
    i+1's file reads + padding + device-side pyramid builds overlap group
    i's train step (shared machinery: apr_tpu.data.pipeline.prefetched).

    Yields (stacked KPPairBatch sharded over ``mesh``, n_real_pairs); with
    ``raw=True`` the first element is instead the nine stacked [B, ...]
    host arrays for the fused-build path (train_step_batched_fused)."""
    from apr_tpu.data.pipeline import prefetched

    indices = list(indices)
    groups = [indices[i:i + group] for i in range(0, len(indices), group)]
    if groups and not pad_tail and len(groups[-1]) < group:
        groups.pop()  # train: drop ragged tail (reshuffled every epoch)

    def build(idxs):
        n_real = len(idxs)
        idxs = list(idxs) + [idxs[-1]] * (group - len(idxs))
        if raw:
            per_raw = [pair_to_raw(dataset.get_pair(int(i)), config)
                       for i in idxs]
            stacked = tuple(jnp.asarray(np.stack(col))
                            for col in zip(*per_raw))
            return shard_batch(stacked, mesh), n_real
        per = [pair_to_kp_batch(dataset.get_pair(int(i)), config)
               for i in idxs]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
        return shard_batch(batch, mesh), n_real

    yield from prefetched(groups, build, prefetch)


def run_predator_training(config: APRConfig,
                          max_epochs: Optional[int] = None) -> Dict:
    os.makedirs(config.out_dir, exist_ok=True)

    # neighborhood calibration (reference Predator_APR/main.py:94-111):
    # when the config does not pin limits, histogram the train set once and
    # cap each layer at the 80th-percentile neighbor count
    train_ds = make_dataset(config, "train")
    if not config.neighborhood_limits_pinned:
        from apr_tpu.eval.predator_tester import calibrate_neighbors

        limits = calibrate_neighbors(train_ds, config)
        log.info("calibrated neighborhood_limits: %s", limits)
        config.neighborhood_limits = limits

    config.save_json(os.path.join(config.out_dir, "config.json"))

    trainer = PredatorTrainer(config)
    val_ds = make_dataset(config, "val")

    devices = jax.devices()
    if config.num_devices:
        devices = devices[: config.num_devices]
    mesh = make_mesh(devices)
    n_dev = len(devices)

    key = jax.random.PRNGKey(config.seed)
    sample = pair_to_kp_batch(train_ds.get_pair(0), config)
    state = trainer.init_state(key, sample)
    state = replicate(state, mesh)

    mngr = CheckpointManager(config.out_dir)
    metrics_log = MetricsLogger(config.out_dir)

    start_epoch = 0
    w_saliency = float(config.w_saliency_loss)
    best_loss, best_recall = 1e5, -1e5
    if config.resume is not None and os.path.isdir(config.resume):
        rm = CheckpointManager(config.resume)
        if rm.latest_epoch() is not None:
            state, meta = rm.restore(state)
            # restored leaves are host arrays: re-replicate onto the mesh
            state = replicate(state, mesh)
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
        # fused path (config.fused_build): carry the built group; each
        # train_step_batched_fused program steps on it AND builds the next
        # group's pyramids — one executable per iteration (see loop.py)
        fused = bool(config.fused_build)
        built = None
        built_pw = None
        raw_prev = None

        def flush_pending(m):
            nonlocal pending
            if pending is not None:
                for name, v in pending.items():
                    meters.setdefault(name, AverageMeter()).update(float(v))
            pending = m

        for batch, n_real in _group_iter(train_ds, order, config, n_dev,
                                         mesh, raw=fused,
                                         pad_tail=len(train_ds) <= n_dev):
            # repetition-padded tail pairs get zero weight so they bias
            # neither the gradients nor the logged train metrics
            pw = jnp.where(jnp.arange(n_dev) < n_real, 1.0 / n_real, 0.0)
            if fused and built is None:
                built = trainer.build_batch_group(batch)
                built_pw, raw_prev = pw, batch
                continue
            key, k = jax.random.split(key)
            keys = jax.random.split(k, n_dev)
            timer.tic()
            if fused:
                state, m, built = trainer.train_step_batched_fused(
                    state, built, keys, jnp.asarray(w_saliency), batch,
                    built_pw)
                built_pw, raw_prev = pw, batch
            else:
                state, m = trainer.train_step_batched(
                    state, batch, keys, jnp.asarray(w_saliency), pw)
            flush_pending(m)
            timer.toc()
            step += 1
            if step % config.stat_freq == 0 and meters:
                scalars = {k_: mt.avg for k_, mt in meters.items()}
                scalars["step_time"] = timer.avg
                metrics_log.write("train", step, scalars)
                log.info("epoch %d step %d loss %.4f (%.2fs/it)",
                         epoch, step, meters["loss"].avg, timer.avg)
        if fused and built is not None:
            # final carried group: step it, rebuilding its own raw as a
            # discarded dummy (keeps a single compiled program)
            key, k = jax.random.split(key)
            keys = jax.random.split(k, n_dev)
            timer.tic()
            state, m, _ = trainer.train_step_batched_fused(
                state, built, keys, jnp.asarray(w_saliency), raw_prev,
                built_pw)
            flush_pending(m)
            timer.toc()
            step += 1
        flush_pending(None)

        if meters:  # epoch-level train scalars (loop.py parity; without
            # this a 1-step epoch under stat_freq deferral logs nothing)
            metrics_log.write("train_epoch", epoch,
                             {k_: mt.avg for k_, mt in meters.items()})

        # validation: full groups run the sharded program; the ragged tail
        # runs per pair (repetition-padding would bias the averages)
        vmeters: Dict[str, AverageMeter] = {}
        n_full = (len(val_ds) // n_dev) * n_dev
        for batch, _ in _group_iter(val_ds, range(n_full), config, n_dev,
                                    mesh):
            key, k = jax.random.split(key)
            keys = jax.random.split(k, n_dev)
            vm = trainer.valid_step_batched(state, batch, keys,
                                            jnp.asarray(w_saliency))
            for name, v in vm.items():
                vmeters.setdefault(name, AverageMeter()).update(float(v))
        for i in range(n_full, len(val_ds)):
            key, k = jax.random.split(key)
            vm = trainer.valid_step(state, pair_to_kp_batch(
                val_ds.get_pair(i), config), k, jnp.asarray(w_saliency))
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
