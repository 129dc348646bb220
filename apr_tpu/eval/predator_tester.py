"""Predator-path tester: overlap*saliency-weighted sampling + RANSAC.

Reference KITTITester/NUSCENESTester (Predator_APR/lib/tester.py:33-141):
per pair — KPFCNN forward; sample 5000 points per cloud with probability
proportional to overlap * saliency (:80-92); RANSAC (thresh 0.3 m, n=4,
50k iters, :97); stack all pairs; registration recall = mean(RRE < 5 deg and
RTE < 2 m); rot/trans mean/median/std on successes; results saved to npz.
"""

from __future__ import annotations

import logging
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import pad_points
from apr_tpu.eval.tester import TestStats
from apr_tpu.registration.matching import feature_nn_correspondences
from apr_tpu.registration.metrics import registration_errors
from apr_tpu.registration.ransac import ransac_pose
from apr_tpu.training.predator import make_kp_pair_batch
from apr_tpu.utils.timer import Timer

log = logging.getLogger(__name__)


class PredatorTester:
    def __init__(self, config: APRConfig, trainer, state):
        self.config = config
        self.trainer = trainer
        self.state = state
        self._step = self._build_step()

    def _build_step(self):
        c = self.config
        n_samples = c.test_subsample

        @jax.jit
        def step(params, batch, key):
            out = self.trainer.model.apply({"params": params["model"]},
                                           batch.pyr0, batch.pyr1)
            m0 = batch.pyr0.levels[0].mask
            m1 = batch.pyr1.levels[0].mask
            xyz0 = batch.pyr0.levels[0].points
            xyz1 = batch.pyr1.levels[0].points

            k0, k1, kr = jax.random.split(key, 3)

            def weighted_sample(k, scores, mask, n_pts):
                # Gumbel top-k == sampling w/o replacement proportional to
                # the (overlap * saliency) weights (tester.py:80-92)
                w = jnp.where(mask, scores, 0.0)
                logw = jnp.log(jnp.maximum(w, 1e-12))
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(k, logw.shape, minval=1e-12, maxval=1.0)
                ))
                keys = jnp.where(mask, logw + g, -jnp.inf)
                _, sel = jax.lax.top_k(keys, min(n_samples, logw.shape[0]))
                smask = jnp.zeros_like(mask).at[sel].set(True) & mask
                return smask

            s0 = weighted_sample(k0, out.overlap0 * out.saliency0, m0,
                                 n_samples)
            s1 = weighted_sample(k1, out.overlap1 * out.saliency1, m1,
                                 n_samples)

            corr = feature_nn_correspondences(out.feats0, out.feats1, s0, s1)
            tgt_pts = xyz1[jnp.clip(corr.tgt_idx, 0, xyz1.shape[0] - 1)]
            res = ransac_pose(
                kr, xyz0, tgt_pts, corr.mask,
                distance_threshold=0.3, ransac_n=4,
                num_hypotheses=c.test_num_ransac_hypotheses,
                escalation_factor=c.test_ransac_escalation_factor or 0,
                escalation_min_inliers=c.test_ransac_escalation_min_inliers,
                escalation_rungs=c.test_ransac_escalation_rungs,
                escalation_confidence=c.test_ransac_escalation_confidence,
            )
            rte, rre = registration_errors(res.transform, batch.t_gt)
            return res.transform, rte, rre, res.fitness

        return step

    def _pair_to_batch(self, pair, point_capacity=None, capacities=None):
        c = self.config
        pc = point_capacity or c.point_capacity
        caps = capacities or c.kp_capacities
        p0, m0 = pad_points(pair["points0"], pc)
        p1, m1 = pad_points(pair["points1"], pc)
        zeros = np.zeros((1, 3), np.float32)
        zmask = np.zeros((1,), bool)
        return make_kp_pair_batch(
            jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
            jnp.asarray(zeros), jnp.asarray(zmask),
            jnp.asarray(zeros), jnp.asarray(zmask),
            jnp.asarray(pair["t_gt"]),
            first_subsampling_dl=c.first_subsampling_dl,
            conv_radius=c.conv_radius,
            capacities=caps,
            neighbor_limits=c.neighborhood_limits,
            overlap_radius=c.overlap_radius,
            radius_select=c.kp_radius_select,
        )

    def _bucketed_batch(self, pair):
        """KP-flavor occupancy bucketing (config.test_capacity_buckets —
        same tier machinery as FeatureTester, eval/bucketing.py; the L0
        grid is first_subsampling_dl)."""
        c = self.config
        if not c.test_capacity_buckets:
            return self._pair_to_batch(pair)
        from apr_tpu.eval.bucketing import bucket_for_pair

        pc, caps = bucket_for_pair(
            pair, c.first_subsampling_dl, c.kp_capacities, c.point_capacity,
            max_tiers=c.test_capacity_buckets)
        return self._pair_to_batch(pair, point_capacity=pc, capacities=caps)

    def test_sharded(self, pairs, mesh=None, seed: int = 0) -> TestStats:
        """Multi-chip eval fan-out (SURVEY.md §5.8), Predator flavor: groups
        of pairs stack into one leading-dim-sharded KPPairBatch; every chip
        runs the same SPMD program (KPFCNN forward + overlap*saliency
        sampling + RANSAC) on its local pairs.  Mirrors
        FeatureTester.test_sharded."""
        import time as _time

        from apr_tpu.parallel import make_mesh, replicate, shard_batch

        c = self.config
        mesh = mesh or make_mesh()
        d = len(mesh.devices.reshape(-1))
        pairs = list(pairs)
        stats = TestStats()
        key = jax.random.PRNGKey(seed)
        params = replicate(self.state.params, mesh)

        step = self._step  # per-pair jitted step, vmapped below

        @jax.jit
        def sharded_step(params, batch, keys):
            return jax.vmap(step, in_axes=(None, 0, 0))(params, batch, keys)

        t0 = None
        n_timed = 0
        for g in range(0, len(pairs), d):
            group = pairs[g:g + d]
            while len(group) < d:  # pad the tail group by repetition
                group.append(group[-1])
            per_pair = [self._pair_to_batch(p) for p in group]
            batch = jax.tree.map(lambda *xs: jnp.stack(xs), *per_pair)
            batch = shard_batch(batch, mesh)
            key, k = jax.random.split(key)
            keys = jax.random.split(k, d)
            _, rte, rre, fitness = sharded_step(params, batch, keys)
            jax.block_until_ready(rte)
            if t0 is None:
                t0 = _time.time()  # first group pays compilation
            else:
                n_timed += len(pairs[g:g + d])
            for i in range(len(pairs[g:g + d])):
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

    def test(self, pairs: Iterable[dict], seed: int = 0,
             log_freq: int = 10, pipelined: bool = True) -> TestStats:
        """Pipelined by default (one device sync for the whole set — see
        FeatureTester.test); pipelined=False syncs per pair with progress
        logging."""
        import time

        c = self.config
        stats = TestStats()
        key = jax.random.PRNGKey(seed)

        results = []
        t_start = None
        n_done = 0
        timer = Timer()
        for i, pair in enumerate(pairs):
            key, k = jax.random.split(key)
            if not pipelined:
                timer.tic()
            batch = self._bucketed_batch(pair)
            out = self._step(self.state.params, batch, k)
            stats.pair_dist.append(float(np.linalg.norm(pair["t_gt"][:3, 3])))
            if pipelined:
                results.append(out)
                if i == 0:
                    jax.block_until_ready(out[0])
                    t_start = time.time()
                else:
                    n_done += 1
                continue
            _, rte, rre, fitness = out
            rte = float(rte)
            rre = float(rre) if np.isfinite(float(rre)) else 180.0
            dt = timer.toc(average=False)
            stats.rte.append(rte)
            stats.rre.append(rre)
            stats.success.append(rte < c.rte_thresh and rre < c.rre_thresh)
            stats.fitness.append(float(fitness))
            if i > 0:
                stats.sec_per_pair.append(dt)
            if (i + 1) % log_freq == 0:
                s = stats.summary()
                log.info("pair %d: recall=%.3f (%.2f pairs/s)", i + 1,
                         s["recall"], s.get("pairs_per_sec", 0.0))

        if pipelined:
            if results:
                jax.block_until_ready(results[-1][0])
            total = (time.time() - t_start) if t_start is not None else 0.0
            for i, (_, rte, rre, fitness) in enumerate(results):
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


def calibrate_neighbors(
    dataset, config: APRConfig, keep_ratio: float = 0.8,
    samples_threshold: int = 2000, max_items: Optional[int] = None,
):
    """Reference calibrate_neighbors parity (dataloader.py:200-232): histogram
    per-layer neighbor counts — over BOTH clouds of each pair, like the
    reference's stacked batch — until every layer holds > samples_threshold
    samples, keep the ``keep_ratio`` percentile as each layer's cap.
    Host-side, run once before training; result feeds
    APRConfig.neighborhood_limits."""
    from apr_tpu.ops.neighbors import radius_neighbors
    from apr_tpu.ops.voxelize import voxelize

    num_levels = len(config.kp_capacities)
    hist_n = int(np.ceil(4 / 3 * np.pi * (config.conv_radius + 1) ** 3))
    counts = np.zeros((num_levels, hist_n), np.int64)

    n_items = len(dataset) if max_items is None else min(len(dataset),
                                                         max_items)
    for i in range(n_items):
        pair = dataset.get_pair(i)
        for cloud in ("points0", "points1"):
            pts_np, mask_np = pad_points(pair[cloud], config.point_capacity)
            pts, mask = jnp.asarray(pts_np), jnp.asarray(mask_np)
            dl = config.first_subsampling_dl
            r = dl * config.conv_radius
            for l in range(num_levels):
                grid = voxelize(pts, dl, config.kp_capacities[l], mask)
                nb = radius_neighbors(
                    grid.barycenter, grid.barycenter, r, hist_n - 1,
                    q_mask=grid.mask, s_mask=grid.mask,
                )
                valid = np.asarray(grid.mask)
                nnb = np.asarray((nb < grid.barycenter.shape[0]).sum(1))[valid]
                counts[l] += np.bincount(nnb, minlength=hist_n)
                dl *= 2
                r *= 2
        if counts.sum(axis=1).min() > samples_threshold:
            break

    cum = np.cumsum(counts.T, axis=0)
    limits = np.sum(cum < (keep_ratio * cum[hist_n - 1, :]), axis=0)
    return tuple(int(x) for x in limits)
