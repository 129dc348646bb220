"""Top-level training loop: epochs, validation, checkpoints, logging.

Reference counterpart: AlignmentTrainer.train (FCGF_APR/lib/trainer.py:
140-169) + GenerativePairTrainer epoch loop (complement_trainer.py:350-512):
per epoch — train over the loader, step the LR schedule, save
``checkpoint``, run validation at val_epoch_freq, track best_val_metric and
save ``best_val_checkpoint``.  Scalars go to a JSONL metrics log (and
tensorboardX if importable, matching the reference's SummaryWriter).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.datasets import make_dataset
from apr_tpu.data.pipeline import PairLoader
from apr_tpu.parallel import make_mesh, replicate, shard_batch
from apr_tpu.training.checkpoints import CheckpointManager
from apr_tpu.training.trainer import get_trainer
from apr_tpu.utils.timer import AverageMeter, Timer

log = logging.getLogger(__name__)

_BIGGER_IS_BETTER = {"feat_match_ratio", "hit_ratio", "success"}


class MetricsLogger:
    """JSONL scalar log + optional tensorboardX."""

    def __init__(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        self.f = open(os.path.join(out_dir, "metrics.jsonl"), "a")
        self.tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self.tb = SummaryWriter(logdir=os.path.join(out_dir, "tb"))
        except Exception:
            pass

    def write(self, phase: str, step: int, scalars: Dict[str, float]):
        rec = {"phase": phase, "step": step, **scalars, "t": time.time()}
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(f"{phase}/{k}", v, step)


def run_training(config: APRConfig, max_epochs: Optional[int] = None) -> Dict:
    """Train per config; returns summary dict (final + best metrics)."""
    os.makedirs(config.out_dir, exist_ok=True)
    config.save_json(os.path.join(config.out_dir, "config.json"))

    trainer = get_trainer(config)
    devices = jax.devices()
    if config.num_devices:
        devices = devices[: config.num_devices]
    # the batch shards across the mesh: use the largest device count that
    # divides the batch size
    n_dev = len(devices)
    pipe = None
    if config.mesh_n_builders:
        # builder/trainer chip split (parallel/pipeline.py): opt-in overlap
        # of build(i+1) and step(i) on DISJOINT submeshes
        n_build = config.mesh_n_builders
        n_train = len(devices) - n_build
        if (n_train >= 1 and config.batch_size % n_build == 0
                and config.batch_size % n_train == 0):
            from apr_tpu.parallel import BuilderTrainerPipeline

            pipe = BuilderTrainerPipeline(trainer, n_build, devices)
            mesh = pipe.train_mesh
            log.info("mesh pipeline: %d trainers + %d builders",
                     n_train, n_build)
        else:
            log.warning(
                "mesh_n_builders=%d incompatible with %d devices / "
                "batch_size=%d; falling back to serial DP",
                n_build, len(devices), config.batch_size)
    if pipe is None:
        while config.batch_size % n_dev != 0:
            n_dev -= 1
        mesh = make_mesh(devices[:n_dev])
        if n_dev != len(devices):
            log.info("mesh uses %d/%d devices (batch_size=%d)",
                     n_dev, len(devices), config.batch_size)
    train_ds = make_dataset(config, "train")
    val_ds = make_dataset(config, "val")
    fused = bool(config.fused_build) and pipe is None
    train_loader = PairLoader(train_ds, config, shuffle=True, seed=config.seed,
                              raw=fused or pipe is not None)
    val_loader = PairLoader(
        val_ds, config, batch_size=config.val_batch_size, shuffle=False,
        drop_last=False,
    )

    key = jax.random.PRNGKey(config.seed)
    sample = next(iter(train_loader))
    if fused or pipe is not None:
        sample = jax.jit(trainer.build_batch)(sample)
    state = trainer.init_state(key, sample)
    state = replicate(state, mesh)

    mngr = CheckpointManager(config.out_dir)
    metrics_log = MetricsLogger(config.out_dir)

    start_epoch = 0
    best_val = None
    if config.resume is not None and os.path.isdir(config.resume):
        rm = CheckpointManager(config.resume)
        if rm.latest_epoch() is not None:
            state, meta = rm.restore(state)
            # restored leaves are host arrays with no sharding: re-replicate
            # so the resumed path compiles/places like the fresh-init path
            state = replicate(state, mesh)
            start_epoch = int(meta["epoch"])
            best_val = meta.get("best_val")
            log.info("resumed from %s at epoch %d", config.resume, start_epoch)
    elif config.weights is not None:
        wm = CheckpointManager(config.weights)
        state, _ = wm.restore_weights_only(state)
        state = replicate(state, mesh)
        log.info("finetune_restart from %s", config.weights)

    epochs = max_epochs or config.max_epoch
    step = int(state.step)
    bigger = config.best_val_metric in _BIGGER_IS_BETTER
    summary: Dict = {}
    # fused mode builds each epoch's FIRST batch outside train_step_fused;
    # jit it once here (it is the same build train_step_fused traces, so
    # eager op-by-op dispatch would cost minutes on TPU)
    build_first = jax.jit(trainer.build_batch) if fused else None

    for epoch in range(start_epoch, epochs):
        state = trainer.set_lr(state, epoch)
        train_loader.set_epoch(epoch)
        meters: Dict[str, AverageMeter] = {}
        data_timer, step_timer = Timer(), Timer()
        t_iter = iter(train_loader)
        # metrics are consumed one step late: converting a device scalar to
        # float blocks until that step finishes, so reading step k-1's
        # metrics AFTER dispatching step k overlaps host metric handling and
        # input assembly with device compute (no per-step sync barrier)
        pending = None

        def flush_pending(m):
            # metrics are consumed one step late (see comment above); this
            # flushes step k-1's metrics and defers step k's
            nonlocal pending
            if pending is not None:
                for name, v in pending.items():
                    meters.setdefault(name, AverageMeter()).update(float(v))
            pending = m

        # fused path (config.fused_build): the loader yields RAW padded
        # arrays; each train_step_fused program steps on the carried batch
        # AND builds the next one — one executable per iteration, no
        # build-vs-step dispatch gap.  The final carried batch gets its step
        # after the loop (rebuilding its own raw as a discarded dummy so no
        # second program needs compiling).
        built = None
        raw_prev = None
        while True:
            data_timer.tic()
            try:
                batch = next(t_iter)
            except StopIteration:
                break
            batch = shard_batch(batch, mesh)
            data_timer.toc()
            if (fused or pipe is not None) and built is None:
                # counted as data time so step/data telemetry covers every
                # build (otherwise one build per epoch escapes both timers)
                data_timer.tic()
                if pipe is not None:
                    built = pipe.to_trainers(pipe.build(batch))
                else:
                    built = build_first(batch)
                data_timer.toc()
                raw_prev = batch
                continue
            key, k = jax.random.split(key)
            if config.profile_dir and step == config.profile_start:
                jax.profiler.start_trace(config.profile_dir)
            step_timer.tic()
            if pipe is not None:
                # builders start batch i+1 first, trainers step on batch i,
                # then the built shards reshard to the trainer submesh —
                # all three in flight on disjoint device queues
                nxt = pipe.build(batch)
                state, m = trainer.train_step(state, built, k)
                built = pipe.to_trainers(nxt)
            elif fused:
                state, m, built = trainer.train_step_fused(
                    state, built, batch, k)
                raw_prev = batch
            else:
                state, m = trainer.train_step(state, batch, k)
            flush_pending(m)
            step_timer.toc()
            if (config.profile_dir
                    and step == config.profile_start + config.profile_steps):
                jax.block_until_ready(m["loss"])
                jax.profiler.stop_trace()
                log.info("profiler trace written to %s", config.profile_dir)
            step += 1
            if step % config.stat_freq == 0 and meters:
                scalars = {k_: mt.avg for k_, mt in meters.items()}
                scalars.update(lr=float(state.lr),
                               data_time=data_timer.avg,
                               step_time=step_timer.avg)
                metrics_log.write("train", step, scalars)
                log.info(
                    "epoch %d step %d loss %.4f (data %.3fs step %.3fs)",
                    epoch, step, meters["loss"].avg, data_timer.avg,
                    step_timer.avg,
                )
        if fused and built is not None:
            key, k = jax.random.split(key)
            step_timer.tic()
            state, m, _ = trainer.train_step_fused(state, built, raw_prev, k)
            flush_pending(m)
            step_timer.toc()
            step += 1
        elif pipe is not None and built is not None:
            # drain the final carried batch
            key, k = jax.random.split(key)
            step_timer.tic()
            state, m = trainer.train_step(state, built, k)
            flush_pending(m)
            step_timer.toc()
            step += 1
        built = None
        flush_pending(None)

        epoch_scalars = {k_: mt.avg for k_, mt in meters.items()}
        metrics_log.write("train_epoch", epoch, epoch_scalars)

        if (epoch + 1) % config.val_epoch_freq == 0:
            vmeters: Dict[str, AverageMeter] = {}
            n_dev = len(mesh.devices.reshape(-1))
            for batch in val_loader:
                # shard like training when the val batch divides the mesh;
                # otherwise (val_batch_size=1 default on a multi-chip mesh)
                # GSPMD replicates it — correct, just not parallel
                if batch.batch_size % n_dev == 0:
                    batch = shard_batch(batch, mesh)
                key, k = jax.random.split(key)
                vm = trainer.valid_step(state, batch, k)
                for name, v in vm.items():
                    vmeters.setdefault(name, AverageMeter()).update(float(v))
            vscalars = {k_: mt.avg for k_, mt in vmeters.items()}
            metrics_log.write("val", epoch, vscalars)
            log.info("val epoch %d: %s", epoch,
                     {k_: round(v, 4) for k_, v in vscalars.items()})
            cur = vscalars.get(config.best_val_metric)
            if cur is not None and (
                best_val is None or (cur > best_val if bigger else cur < best_val)
            ):
                best_val = cur
                mngr.save(epoch + 1, state,
                          extra={"best_val": best_val}, tag="best")
                summary["best_val"] = best_val
                summary["best_epoch"] = epoch
            summary["last_val"] = vscalars

        mngr.save(epoch + 1, state, extra={"best_val": best_val})
        summary["last_train"] = epoch_scalars

    summary["steps"] = step
    return summary
