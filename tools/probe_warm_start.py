"""Warm-start attribution experiment (round-5 verdict weak-item 1).

Round 4 left a 4-5x gap between the driver-observed warm start (82.4 s:
AOT hit, trace 2.8 + load 0.8 + first_run 78.8) and the best logged warm
runs (15.7-18.1 s).  The round-4 explanation blamed first-execute staging
of the ~150-210 MB serialized executable — but the SAME bench run staged
the 104-110 MB predator executable in 3.1 s right after, which a
size-proportional story cannot explain.

Hypothesis H-warmup: the 15-157 s first-execute variance is dominated by
ONE-TIME backend/tunnel warmup that the first substantial program of the
process pays, not by per-executable staging.  Test: execute a trivial jit
program first (timed), then deserialize + first-execute the big fcgf_eval
AOT entry (timed).  If the big program's first-execute collapses once a
tiny program has gone first, H-warmup wins and the fix is a cheap
pre-stage + honest phase attribution in bench.py.

    python tools/probe_warm_start.py
"""

import glob
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    x = jax.jit(lambda a: a * 2.0 + 1.0)(jnp.ones((128, 128)))
    float(x.sum())
    print(f"# tiny-program warmup (compile+first run): "
          f"{time.time() - t0:.1f}s", flush=True)

    # a second tiny but DIFFERENT program separates backend-warmup from
    # per-program costs
    t0 = time.time()
    y = jax.jit(lambda a: jnp.tanh(a) @ a.T)(jnp.ones((256, 256)))
    float(y.sum())
    print(f"# second tiny program: {time.time() - t0:.1f}s", flush=True)

    from bench import SCAN_ITERS, aot_compile  # noqa: F401  (repo root)
    import numpy as np
    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer

    # reproduce the bench's fcgf_eval program exactly via bench.py main
    # machinery is heavy; instead load the LARGEST cached fcgf executable
    # and re-execute it is impossible without its exact arg spec — so
    # rebuild the bench program the same way bench.py does.
    import bench as bench_mod

    cfg = APRConfig(
        trainer="GenerativePairTrainer", model="ResUNetFatBN",
        model_n_out=128, conv1_kernel_size=5, voxel_size=0.3,
        point_capacity=32768, capacities=(16384, 8192, 4096, 2048),
        apc_capacity=8, test_num_ransac_hypotheses=32768,
    )
    trainer = get_trainer(cfg)
    pair = synthetic_pair(seed=0, n_points=30000, apc_points=4, extent=60.0,
                          distance=20.0)
    tester = FeatureTester(cfg, trainer, None)
    t0 = time.time()
    batch0 = tester._pair_to_batch(pair)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    print(f"# init (first real programs): {time.time() - t0:.1f}s",
          flush=True)
    tester.state = state

    p0, m0 = pad_points(pair["points0"], cfg.point_capacity)
    p1, m1 = pad_points(pair["points1"], cfg.point_capacity)
    raw = (jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1),
           jnp.asarray(m1), jnp.asarray(pair["t_gt"]))

    GROUP = 4

    def one_group(params, bstats, key, pts0, mask0, pts1, mask1, t_gt):
        k_j0, k_j1, k_e = jax.random.split(key, 3)
        from apr_tpu.training.batching import make_pair_batch
        c = cfg
        p0 = pts0[None] + jax.random.normal(k_j0, (GROUP,) + pts0.shape) * 1e-4
        p1 = pts1[None] + jax.random.normal(k_j1, (GROUP,) + pts1.shape) * 1e-4
        m0 = jnp.broadcast_to(mask0[None], (GROUP,) + mask0.shape)
        m1 = jnp.broadcast_to(mask1[None], (GROUP,) + mask1.shape)
        tg = jnp.broadcast_to(t_gt[None], (GROUP, 4, 4))
        zeros = jnp.zeros((GROUP, 1, 3))
        zmask = jnp.zeros((GROUP, 1), bool)
        b = make_pair_batch(
            p0, m0, p1, m1, zeros, zmask, zeros, zmask, tg,
            voxel_size=c.voxel_size, capacities=c.capacities,
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
            with_correspondences=False,
        )
        f0, f1, _ = trainer._encode_pair(params, bstats, b, False)
        keys = jax.random.split(k_e, GROUP)
        return jax.vmap(
            tester._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(params, bstats, f0, f1, b.xyz0, b.xyz1,
          b.pyramid0.levels[0].mask, b.pyramid1.levels[0].mask,
          b.t_gt, keys)

    def bench_scan(key, raw, params, bstats):
        pts0, mask0, pts1, mask1, t_gt = raw

        def body(carry, k):
            t_est, rte, rre, fit = one_group(
                params, bstats, k, pts0, mask0, pts1, mask1, t_gt)
            return carry + jnp.sum(rte), (rte, rre)

        keys = jax.random.split(key, SCAN_ITERS)
        acc, outs = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc, outs

    phases = {}
    call1 = (jax.random.PRNGKey(1), raw, state.params, state.batch_stats)
    t0 = time.time()
    compiled = bench_mod.aot_compile(bench_scan, call1, "fcgf_eval", phases)
    t_load = time.time() - t0
    t0 = time.time()
    acc, _ = compiled(*call1)
    float(acc)
    t_first = time.time() - t0
    print(f"# fcgf_eval after warmup: trace/load {t_load:.1f}s "
          f"(phases {phases}), first-execute {t_first:.1f}s", flush=True)
    t0 = time.time()
    acc, _ = compiled(jax.random.PRNGKey(2), raw, state.params,
                      state.batch_stats)
    float(acc)
    print(f"# fcgf_eval second execute: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
