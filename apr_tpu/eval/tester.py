"""Registration eval harness — the APR/FCGF tester rebuilt on-device.

Reference protocol (FCGF_APR/scripts/test_apr.py:69-218, test_fcgf.py):
per test pair (batch 1): encoder forward on both clouds; subsample 5000
points; feature-space NN correspondences; Open3D feature-matching RANSAC
(4M iters / 10k confidence, thresh = voxel_size); RTE/RRE vs ground truth;
success = RTE < 2 m AND RRE < 5 deg; running averages + per-pair logs.

Here the whole per-pair pipeline — voxelize -> pyramid -> encode ->
subsample -> match -> RANSAC -> errors — is one jit program, so eval
throughput is a single device-bound number (the reference splits work
between GPU features and multi-second CPU RANSAC).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import pad_points
from apr_tpu.registration.matching import feature_nn_correspondences
from apr_tpu.registration.metrics import registration_errors
from apr_tpu.registration.ransac import ransac_pose
from apr_tpu.training.batching import make_pair_batch
from apr_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


@dataclass
class TestStats:
    rte: List[float] = field(default_factory=list)
    rre: List[float] = field(default_factory=list)
    success: List[bool] = field(default_factory=list)
    fitness: List[float] = field(default_factory=list)
    sec_per_pair: List[float] = field(default_factory=list)
    pair_dist: List[float] = field(default_factory=list)  # GT frame distance

    def summary(self) -> Dict[str, float]:
        rte = np.asarray(self.rte)
        rre = np.asarray(self.rre)
        succ = np.asarray(self.success, dtype=bool)
        out = dict(
            recall=float(succ.mean()) if len(succ) else 0.0,
            n_pairs=len(succ),
            pairs_per_sec=(
                1.0 / float(np.mean(self.sec_per_pair))
                if self.sec_per_pair else 0.0
            ),
        )
        if succ.any():
            out.update(
                rte_mean=float(rte[succ].mean()),
                rte_std=float(rte[succ].std()),
                rre_mean=float(rre[succ].mean()),
                rre_std=float(rre[succ].std()),
            )
        return out

    def save(self, out_dir: str) -> None:
        """Eval artifacts (reference Predator_APR/lib/tester.py:110-126):
        ``results.npz`` with the raw per-pair arrays plus
        ``success_dists.npy`` / ``fail_dists.npy`` — the GT pair distances of
        succeeded / failed registrations."""
        import os

        os.makedirs(out_dir, exist_ok=True)
        succ = np.asarray(self.success, dtype=bool)
        dists = np.asarray(self.pair_dist, dtype=np.float32)
        np.savez(
            os.path.join(out_dir, "results.npz"),
            rte=np.asarray(self.rte, np.float32),
            rre=np.asarray(self.rre, np.float32),
            success=succ,
            fitness=np.asarray(self.fitness, np.float32),
            pair_dist=dists,
        )
        if len(dists) == len(succ):
            np.save(os.path.join(out_dir, "success_dists.npy"), dists[succ])
            np.save(os.path.join(out_dir, "fail_dists.npy"), dists[~succ])


class FeatureTester:
    """Evaluate a trained encoder on an iterable of pair dicts.

    Each pair dict: points0, points1 (np [N,3]), t_gt (np [4,4]).
    """

    def __init__(self, config: APRConfig, trainer, state):
        self.config = config
        self.trainer = trainer
        self.state = state
        self._step = self._build_step()

    def _build_step(self):
        c = self.config
        thresh = c.test_ransac_dist_thresh or c.voxel_size

        def eval_one(params, batch_stats, f0, f1, xyz0, xyz1, m0, m1, t_gt,
                     key):
            # random 5000-point subsample of valid voxels (test_apr.py:142),
            # gathered into a compact [n_sub, C] buffer so the feature-NN
            # search runs over n_sub x N instead of N x N
            k_sub, k_ransac = jax.random.split(key)
            n_sub = min(c.test_subsample, m0.shape[0])
            scores = jnp.where(m0, jax.random.uniform(k_sub, m0.shape), -1.0)
            # approx_max_k: exact top_k of 5000-of-16384 is a full sort on
            # TPU; approximate selection is fine for a random subsample
            top, sel = jax.lax.approx_max_k(scores, n_sub)
            sel = sel.astype(jnp.int32)
            sub_ok = top >= 0.0
            f0_sub = f0[sel]
            xyz0_sub = xyz0[sel]

            corr = feature_nn_correspondences(f0_sub, f1, sub_ok, m1)
            tgt_pts = xyz1[jnp.clip(corr.tgt_idx, 0, xyz1.shape[0] - 1)]
            res = ransac_pose(
                k_ransac, xyz0_sub, tgt_pts, corr.mask,
                distance_threshold=thresh,
                ransac_n=4,
                num_hypotheses=c.test_num_ransac_hypotheses,
                escalation_factor=c.test_ransac_escalation_factor or 0,
                escalation_min_inliers=c.test_ransac_escalation_min_inliers,
                escalation_rungs=c.test_ransac_escalation_rungs,
                escalation_confidence=c.test_ransac_escalation_confidence,
            )
            rte, rre = registration_errors(res.transform, t_gt)
            return res.transform, rte, rre, res.fitness

        self._eval_one = eval_one

        @jax.jit
        def step(params, batch_stats, batch, key):
            f0, f1, _ = self.trainer._encode_pair(params, batch_stats,
                                                  batch, False)
            m0 = batch.pyramid0.levels[0].mask[0]
            m1 = batch.pyramid1.levels[0].mask[0]
            return eval_one(params, batch_stats, f0[0], f1[0],
                            batch.xyz0[0], batch.xyz1[0], m0, m1,
                            batch.t_gt[0], key)

        return step

    def test_sharded(self, pairs, mesh=None, seed: int = 0) -> TestStats:
        """Multi-chip eval fan-out (SURVEY.md §5.8): a group of pairs batches
        into one PairBatch whose leading dim shards across the mesh; each
        chip evaluates its pairs in the same SPMD program."""
        from apr_tpu.parallel import make_mesh, replicate, shard_batch

        c = self.config
        mesh = mesh or make_mesh()
        d = len(mesh.devices.reshape(-1))
        pairs = list(pairs)
        stats = TestStats()
        key = jax.random.PRNGKey(seed)
        params = replicate(self.state.params, mesh)
        batch_stats = replicate(self.state.batch_stats, mesh)

        @jax.jit
        def sharded_step(params, bstats, batch, keys):
            f0, f1, _ = self.trainer._encode_pair(params, bstats, batch,
                                                  False)
            return jax.vmap(
                self._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
            )(params, bstats, f0, f1, batch.xyz0, batch.xyz1,
              batch.pyramid0.levels[0].mask, batch.pyramid1.levels[0].mask,
              batch.t_gt, keys)

        import time as _time

        # tier-aware grouping (config.test_capacity_buckets): consecutive
        # runs of same-tier pairs form groups so every group compiles at
        # its own (smaller) capacities; input ORDER is preserved (results
        # stay aligned with the dataset), at worst costing extra padded
        # tail groups at tier boundaries — adjacent KITTI frames have
        # correlated sizes, so runs are long in practice
        def tier_of(pair):
            if not c.test_capacity_buckets:
                return (c.point_capacity, tuple(c.capacities))
            from apr_tpu.eval.bucketing import bucket_for_pair

            return bucket_for_pair(pair, c.voxel_size, c.capacities,
                                   c.point_capacity,
                                   max_tiers=c.test_capacity_buckets)

        groups = []
        for pair in pairs:
            t = tier_of(pair)
            if groups and groups[-1][0] == t and len(groups[-1][1]) < d:
                groups[-1][1].append(pair)
            else:
                groups.append((t, [pair]))

        t0 = None
        n_timed = 0
        for (pc, caps), group in groups:
            n_real = len(group)
            group = list(group)
            while len(group) < d:  # pad the tail group by repetition
                group.append(group[-1])
            cols = [[] for _ in range(4)]
            for pair in group:
                p0, m0 = pad_points(pair["points0"], pc)
                p1, m1 = pad_points(pair["points1"], pc)
                for col, v in zip(cols, (p0, m0, p1, m1)):
                    col.append(v)
            zeros = jnp.zeros((d, 1, 3))
            zmask = jnp.zeros((d, 1), bool)
            batch = make_pair_batch(
                jnp.asarray(np.stack(cols[0])), jnp.asarray(np.stack(cols[1])),
                jnp.asarray(np.stack(cols[2])), jnp.asarray(np.stack(cols[3])),
                zeros, zmask, zeros, zmask,
                jnp.asarray(np.stack([p["t_gt"] for p in group])),
                voxel_size=c.voxel_size, capacities=caps,
                conv1_kernel_size=c.conv1_kernel_size,
                corr_cap=c.corr_capacity_per_point,
                search_multiplier=c.positive_pair_search_voxel_size_multiplier,
                with_correspondences=False,
            )
            batch = shard_batch(batch, mesh)
            key, k = jax.random.split(key)
            keys = jax.random.split(k, d)
            t_est, rte, rre, fitness = sharded_step(
                params, batch_stats, batch, keys
            )
            jax.block_until_ready(rte)
            if t0 is None:
                t0 = _time.time()  # first group pays compilation
            else:
                n_timed += n_real
            for i in range(n_real):
                r, e = float(rte[i]), float(rre[i])
                e = e if np.isfinite(e) else 180.0
                stats.rte.append(r)
                stats.rre.append(e)
                stats.success.append(r < c.rte_thresh and e < c.rre_thresh)
                stats.fitness.append(float(fitness[i]))
                stats.pair_dist.append(
                    float(np.linalg.norm(group[i]["t_gt"][:3, 3])))
        if t0 is not None and n_timed:
            per = (_time.time() - t0) / n_timed
            stats.sec_per_pair.extend([per] * n_timed)
        return stats

    def _pair_to_batch(self, pair, point_capacity=None, capacities=None):
        """Build the device batch for one pair; ``point_capacity`` /
        ``capacities`` override the config's worst-case buffers (the
        occupancy-bucketed tiers of eval/bucketing.py)."""
        c = self.config
        pc = point_capacity or c.point_capacity
        caps = capacities or c.capacities
        p0, m0 = pad_points(pair["points0"], pc)
        p1, m1 = pad_points(pair["points1"], pc)
        zeros = np.zeros((1, 1, 3), np.float32)
        zmask = np.zeros((1, 1), bool)
        return make_pair_batch(
            jnp.asarray(p0)[None], jnp.asarray(m0)[None],
            jnp.asarray(p1)[None], jnp.asarray(m1)[None],
            jnp.asarray(zeros), jnp.asarray(zmask),
            jnp.asarray(zeros), jnp.asarray(zmask),
            jnp.asarray(pair["t_gt"])[None],
            voxel_size=c.voxel_size,
            capacities=caps,
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
            with_correspondences=False,
        )

    def _bucketed_batch(self, pair):
        """Batch at the smallest capacity tier holding the pair
        (config.test_capacity_buckets > 0); worst-case buffers otherwise."""
        c = self.config
        if not c.test_capacity_buckets:
            return self._pair_to_batch(pair)
        from apr_tpu.eval.bucketing import bucket_for_pair

        pc, caps = bucket_for_pair(
            pair, c.voxel_size, c.capacities, c.point_capacity,
            max_tiers=c.test_capacity_buckets)
        return self._pair_to_batch(pair, point_capacity=pc, capacities=caps)

    def test(self, pairs: Iterable[dict], seed: int = 0,
             log_freq: int = 10, pipelined: bool = True) -> TestStats:
        """Evaluate all pairs.

        ``pipelined=True`` (default) submits every pair's device program
        asynchronously and synchronizes ONCE at the end — per-pair host/device
        round-trip latency (multi-second through the axon tunnel) amortizes
        across the whole set.  ``pipelined=False`` syncs per pair and reports
        per-pair wall times (reference-style progress logging).
        """
        c = self.config
        stats = TestStats()
        key = jax.random.PRNGKey(seed)
        timer = Timer()

        if pipelined:
            results = []
            t_start = None
            n_done = 0
            for i, pair in enumerate(pairs):
                key, k = jax.random.split(key)
                batch = self._bucketed_batch(pair)
                out = self._step(
                    self.state.params, self.state.batch_stats, batch, k
                )
                stats.pair_dist.append(
                    float(np.linalg.norm(pair["t_gt"][:3, 3])))
                results.append(out)
                if i == 0:
                    # first pair pays compilation; sync then start the clock
                    jax.block_until_ready(out[0])
                    t_start = time.time()
                else:
                    n_done += 1
            if results:
                jax.block_until_ready(results[-1][0])
            total = (time.time() - t_start) if t_start is not None else 0.0
            for i, (t_est, rte, rre, fitness) in enumerate(results):
                rte = float(rte)
                rre = float(rre) if np.isfinite(float(rre)) else 180.0
                stats.rte.append(rte)
                stats.rre.append(rre)
                stats.success.append(
                    rte < c.rte_thresh and rre < c.rre_thresh
                )
                stats.fitness.append(float(fitness))
                if i > 0:
                    stats.sec_per_pair.append(total / max(n_done, 1))
            return stats

        for i, pair in enumerate(pairs):
            key, k = jax.random.split(key)
            timer.tic()
            batch = self._bucketed_batch(pair)
            t_est, rte, rre, fitness = self._step(
                self.state.params, self.state.batch_stats, batch, k
            )
            stats.pair_dist.append(float(np.linalg.norm(pair["t_gt"][:3, 3])))
            rte = float(rte)
            rre = float(rre) if np.isfinite(float(rre)) else 180.0
            dt = timer.toc(average=False)
            stats.rte.append(rte)
            stats.rre.append(rre)
            stats.success.append(rte < c.rte_thresh and rre < c.rre_thresh)
            stats.fitness.append(float(fitness))
            if i > 0:  # first pair pays compilation; keep timing honest
                stats.sec_per_pair.append(dt)
            if (i + 1) % log_freq == 0:
                s = stats.summary()
                log.info(
                    "pair %d: recall=%.3f rte=%.3f rre=%.3f %.2f pairs/s",
                    i + 1, s["recall"], rte, rre, s.get("pairs_per_sec", 0.0),
                )
        return stats
