"""Host-side input pipeline: pad, collate, prefetch, feed the device.

Replaces torch DataLoader worker processes (reference
complement_data_loader.py:1375-1382) with a double-buffered background-thread
prefetcher: batch i+1's numpy assembly overlaps batch i's device step; the
expensive geometry (voxelize / pyramids / correspondences) runs on device in
``make_pair_batch``, so the host only reads + pads.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.datasets import PairDataset
from apr_tpu.data.synthetic import pad_points
from apr_tpu.training.batching import PairBatch, make_pair_batch


def prefetched(items, produce, prefetch: int = 2):
    """Generator over ``produce(item)`` with a background producer thread.

    Shared prefetch machinery (queue + stop event + drain-safe put + the
    ok/done/err protocol) for PairLoader and the Predator batch iterator —
    one implementation of the abandoned-consumer semantics.
    """

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def put(item):
        # re-check stop while blocked on the full queue so an abandoned
        # consumer can't strand this thread (and its prefetched payloads)
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for it in items:
                if stop.is_set():
                    return
                if not put(("ok", produce(it))):
                    return
            put(("done", None))
        except Exception as e:  # surface worker errors to the consumer
            put(("err", e))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            kind, payload = q.get()
            if kind == "done":
                return
            if kind == "err":
                raise payload
            yield payload
    finally:
        stop.set()


def collate_raw(pairs: Sequence[dict], config: APRConfig):
    """Pad a list of pair dicts into the nine stacked device arrays that
    ``make_pair_batch`` consumes — host work only (read + pad + H2D); the
    device-side build runs later, fused into the train step
    (FCGFTrainer.train_step_fused)."""
    cols = [[] for _ in range(9)]
    for d in pairs:
        p0, m0 = pad_points(d["points0"], config.point_capacity)
        p1, m1 = pad_points(d["points1"], config.point_capacity)
        a0, am0 = pad_points(d["apc0"], config.apc_capacity)
        a1, am1 = pad_points(d["apc1"], config.apc_capacity)
        for col, v in zip(cols, (p0, m0, p1, m1, a0, am0, a1, am1,
                                 d["t_gt"].astype(np.float32))):
            col.append(v)
    return tuple(jnp.asarray(np.stack(c)) for c in cols)


def collate_pairs(pairs: Sequence[dict], config: APRConfig,
                  point_capacity: Optional[int] = None,
                  capacities=None) -> PairBatch:
    """Pad a list of pair dicts into one device batch; ``point_capacity``
    / ``capacities`` override the config's worst-case buffers (the
    capacity tiers of eval/bucketing.py)."""
    if point_capacity is not None:
        config = config.replace(point_capacity=point_capacity)
    arrs = collate_raw(pairs, config)
    return make_pair_batch(
        *arrs,
        voxel_size=config.voxel_size,
        capacities=tuple(capacities or config.capacities),
        conv1_kernel_size=config.conv1_kernel_size,
        corr_cap=config.corr_capacity_per_point,
        search_multiplier=config.positive_pair_search_voxel_size_multiplier,
    )


class PairLoader:
    """Iterates device-ready PairBatches with background prefetch."""

    def __init__(
        self,
        dataset: PairDataset,
        config: APRConfig,
        batch_size: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        drop_last: bool = True,
        raw: bool = False,
    ):
        self.dataset = dataset
        self.config = config
        self.batch_size = batch_size or config.batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.raw = raw  # yield collate_raw tuples for the fused-build path
        # capacity-tier batching (config.train_capacity_buckets): group
        # each epoch's pairs into occupancy tiers so light batches build +
        # train in shrunken buffers (eval/bucketing.py select logic); only
        # meaningful for built (non-raw) batches
        self.bucket_tiers = 0 if raw else int(
            getattr(config, "train_capacity_buckets", 0) or 0)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def _index_order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            return rng.permutation(n)
        return np.arange(n)

    def __iter__(self) -> Iterator[PairBatch]:
        order = self._index_order()

        if self.bucket_tiers:
            yield from self._iter_bucketed(order)
            return

        def build_batch(b):
            # collate IN the producer thread: jax dispatch is async and
            # thread-safe, so batch i+1's H2D transfers and device-side
            # build program (voxelize/pyramids/correspondences in
            # make_pair_batch) are enqueued while batch i's train step is
            # still running — the consumer receives device-ready batches
            # with no dispatch gap between step i and build i+1
            idxs = order[b * self.batch_size:(b + 1) * self.batch_size]
            pairs = [self.dataset.get_pair(int(i)) for i in idxs]
            if self.raw:
                return collate_raw(pairs, self.config)
            return collate_pairs(pairs, self.config)

        yield from prefetched(range(len(self)), build_batch, self.prefetch)

    def _iter_bucketed(self, order):
        """Tier-batched epoch: pairs accumulate per capacity tier and a
        batch is emitted when its tier fills, so every batch carries a
        uniform (smallest-fitting) buffer shape.  Leftover pairs re-tier
        to worst-case buffers at epoch end; the final partial batch drops
        under drop_last — the same tail semantics as plain batching."""
        from apr_tpu.eval.bucketing import bucket_for_pair

        c = self.config

        def tiered_batches():
            accs = {}
            for i in order:
                pair = self.dataset.get_pair(int(i))
                tier = bucket_for_pair(
                    pair, c.voxel_size, c.capacities, c.point_capacity,
                    max_tiers=self.bucket_tiers)
                accs.setdefault(tier, []).append(pair)
                if len(accs[tier]) == self.batch_size:
                    yield tier, accs.pop(tier)
            # leftovers in arrival order at the worst-case tier
            rest = [p for tier in list(accs) for p in accs.pop(tier)]
            full = (c.point_capacity, tuple(c.capacities))
            for b in range(0, len(rest), self.batch_size):
                chunk = rest[b:b + self.batch_size]
                if len(chunk) < self.batch_size and self.drop_last:
                    break
                yield full, chunk

        def build(item):
            (pc, caps), pairs = item
            return collate_pairs(pairs, c, point_capacity=pc,
                                 capacities=caps)

        yield from prefetched(tiered_batches(), build, self.prefetch)
