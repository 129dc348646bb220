"""Builder/trainer chip split: overlap device-side batch build with the step.

The reference hides ALL batch prep in torch DataLoader worker PROCESSES
(FCGF_APR/lib/complement_data_loader.py:1375-1382) — a resource pool
separate from the GPU, so its sustained step time excludes prep.  On TPU
the build runs on device (that's what makes it fast), and a chip's
execution queue is serial: per-chip steady state is build + step no matter
how programs are split (measured: fusing them into one executable was ~4%
SLOWER than queued separate programs, docs/PERF.md).

This module implements the only true overlap the hardware offers:
DIFFERENT chips.  ``n_builders`` devices build batch i+1's shards while
the remaining trainers step on batch i; built shards then move to the
trainer submesh (an async ICI reshard).

When is the split worth it?  With homogeneous chips and a perfectly
data-parallel build it provably is NOT for raw throughput: serial DP gives
n/(b+s) batches/s; a t-trainer/k-builder split gives t/s bounded by
keeping builders fed (k >= t*b/s), and t/s > n/(b+s) requires t*b > k*s —
the two conditions meet only at equality.  The split DOES win when the
step must synchronize at a cadence the build would stall (pipeline-
parallel stages), when builders are a different resource (spare hosts),
or when build does not data-parallelize.  It ships as an opt-in
(config.mesh_n_builders) with the algebra recorded here and in
docs/PERF.md so the default stays the provably-optimal serial DP.
"""

from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from apr_tpu.parallel.mesh import make_mesh, replicate, shard_batch


class BuilderTrainerPipeline:
    """Drives build(i+1) on the builder submesh while step(i) runs on the
    trainer submesh.

    ``trainer`` needs ``build_batch(raw) -> batch`` and
    ``train_step(state, batch, key)``; raw batches are the nine padded
    host arrays of ``collate_raw`` with a leading global-batch dim
    divisible by both submesh sizes.
    """

    def __init__(self, trainer, n_builders: int,
                 devices: Optional[Sequence[Any]] = None):
        devices = list(devices if devices is not None else jax.devices())
        if not 0 < n_builders < len(devices):
            raise ValueError(
                f"n_builders={n_builders} needs 1..{len(devices) - 1} "
                f"of {len(devices)} devices")
        self.trainer = trainer
        self.train_mesh = make_mesh(devices[: len(devices) - n_builders])
        self.build_mesh = make_mesh(devices[len(devices) - n_builders:])
        self._build = jax.jit(trainer.build_batch)

    def build(self, raw):
        """Submit the build on the builder submesh (async)."""
        raw = shard_batch(raw, self.build_mesh)
        return self._build(raw)

    def to_trainers(self, batch):
        """Move a built batch's shards onto the trainer submesh (async ICI
        reshard; overlaps with whatever the trainers are executing)."""
        def put(x):
            spec = P("data", *([None] * (x.ndim - 1))) if x.ndim else P()
            return jax.device_put(x, NamedSharding(self.train_mesh, spec))

        return jax.tree.map(put, batch)

    def replicate_state(self, state):
        return replicate(state, self.train_mesh)

    def run(self, state, raw_batches: Iterable, key: jax.Array,
            on_metrics=None):
        """Steady-state loop: for each iteration, the step on batch i and
        the build of batch i+1 are in flight on DISJOINT devices."""
        built = None
        for raw in raw_batches:
            nxt = self.build(raw)           # builders start immediately
            if built is not None:
                key, k = jax.random.split(key)
                state, metrics = self.trainer.train_step(state, built, k)
                if on_metrics is not None:
                    on_metrics(metrics)
            built = self.to_trainers(nxt)
        if built is not None:               # drain the final batch
            key, k = jax.random.split(key)
            state, metrics = self.trainer.train_step(state, built, k)
            if on_metrics is not None:
                on_metrics(metrics)
        return state
