"""A/B validation of the APR recipe's core claim on synthetic scenes.

The reference's headline result (README.md:6, /root/reference) is that adding
the APC-reconstruction branch to a contrastive feature extractor improves
distant-pair registration recall (+7.1% LoKITTI).  No KITTI frames exist in
this environment, so this tool reproduces the *experimental design* on
synthetic LiDAR-like scenes whose range-dependent thinning gives the same
sparse-evidence-at-distance structure (apr_tpu/data/synthetic.py):

  arm A ("apr"):      GenerativePairTrainer, loss_ratio as configured —
                      hardest-contrastive + Chamfer-vs-APC on the encoder.
  arm B ("baseline"): the IDENTICAL program with loss_ratio=0 — the encoder
                      gradient is then exactly the hardest-contrastive loss
                      (the generator branch is scaled to zero), i.e. plain
                      FCGF training (FCGF_APR/lib/trainer.py:398-527).

Both arms share seeds, data, init (encoder init is loss_ratio-independent)
and step count; evaluation is the reference protocol (feature-NN matching +
RANSAC, RTE<2 m ∧ RRE<5°) on held-out pairs at distances BEYOND the training
range — the LoKITTI pattern (train 5-20 m, test 40-50 m,
FCGF_APR/scripts/train_apr_kitti.sh:23 + file_LoKITTI_50.npy).

    python tools/validate_apr_gain.py [--steps 1500] [--eval_pairs 24]
        [--pool_pairs 96] [--train_dists 6,10,14,18] [--eval_dists 12,25,32]

The in-range 12 m eval set is the control: the paper's claim is that the
gain concentrates on the distant (out-of-range) sets.

Prints one RESULT line per arm plus the recall delta.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_config(loss_ratio):
    from apr_tpu.config import APRConfig

    # validate_convergence.py's small-scale recipe, unchanged except for the
    # ablated loss_ratio so the two arms differ in exactly one scalar
    return APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetBN2",
        model_n_out=32,
        conv1_kernel_size=5,
        generator_model="GenerativeMLP_54",
        point_generation_ratio=2,
        batch_size=2,
        num_pos_per_batch=512,
        num_hn_samples_per_batch=128,
        voxel_size=0.5,
        point_capacity=8192,
        capacities=(8192, 4096, 2048, 1024),
        apc_capacity=8192,
        optimizer="SGD",
        lr=0.1,
        loss_ratio=loss_ratio,
        test_num_ransac_hypotheses=16384,
        test_subsample=4000,
    )


def run_arm(label, cfg, train_dists, eval_sets, steps, pool_pairs,
            extent, max_range, seed0=0):
    import jax
    import jax.numpy as jnp

    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer, make_pair_batch

    trainer = get_trainer(cfg)

    def build(seed_dist_pairs):
        cols = [[] for _ in range(9)]
        for s, dist in seed_dist_pairs:
            d = synthetic_pair(s, n_points=7000, apc_points=7000,
                               distance=dist, extent=extent,
                               max_range=max_range)
            vals = [*pad_points(d["points0"], cfg.point_capacity),
                    *pad_points(d["points1"], cfg.point_capacity),
                    *pad_points(d["apc0"], cfg.apc_capacity),
                    *pad_points(d["apc1"], cfg.apc_capacity), d["t_gt"]]
            for c, v in zip(cols, vals):
                c.append(v)
        return make_pair_batch(
            *[jnp.asarray(np.stack(c)) for c in cols],
            voxel_size=cfg.voxel_size, capacities=cfg.capacities,
            conv1_kernel_size=cfg.conv1_kernel_size,
            corr_cap=cfg.corr_capacity_per_point,
            search_multiplier=cfg.positive_pair_search_voxel_size_multiplier,
        )

    # pool_pairs training pairs, two per batch, distances cycling through
    # the training range — identical seeds in both arms.  Each scene is
    # fresh geometry (seeded), so the pool size controls how much the
    # encoder can memorize vs. generalize.
    n_batches = max(pool_pairs // 2, 1)
    train_batches = [
        build([(seed0 + 2 * i, train_dists[(2 * i) % len(train_dists)]),
               (seed0 + 2 * i + 1,
                train_dists[(2 * i + 1) % len(train_dists)])])
        for i in range(n_batches)
    ]
    state = trainer.init_state(jax.random.PRNGKey(seed0), train_batches[0])

    t0 = time.time()
    steps_per_epoch = 25
    for step in range(steps):
        if step % steps_per_epoch == 0:
            state = trainer.set_lr(state, step // steps_per_epoch)
        key = jax.random.PRNGKey(seed0 + step)
        state, metrics = trainer.train_step(
            state, train_batches[step % len(train_batches)], key)
        if (step + 1) % 100 == 0:
            print(f"# [{label}] step {step + 1}: "
                  f"loss={float(metrics['loss']):.4f} "
                  f"chamfer={float(metrics.get('chamfer_loss', 0.0)):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    tester = FeatureTester(cfg, trainer, state)
    results = {}
    for dist, pairs in eval_sets.items():
        stats = tester.test(pairs, pipelined=False)
        s = stats.summary()
        results[dist] = s
        print(f"RESULT arm={label} eval_dist={dist} "
              f"recall={s['recall']:.3f} "
              f"rte_mean={s.get('rte_mean', float('nan')):.3f} "
              f"rre_mean={s.get('rre_mean', float('nan')):.3f} "
              f"n={s['n_pairs']}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_pairs", type=int, default=24)
    ap.add_argument("--pool_pairs", type=int, default=96,
                    help="distinct training scenes (2 per batch)")
    ap.add_argument("--train_dists", default="6,10,14,18")
    ap.add_argument("--eval_dists", default="12,40,48,56")
    ap.add_argument("--eval_points", type=int, default=7000,
                    help="points per eval cloud (sparser = harder; the "
                         "LoKITTI failure mode is sparse overlap evidence)")
    ap.add_argument("--extent", type=float, default=60.0,
                    help="scene radius (m)")
    ap.add_argument("--max_range", type=float, default=35.0,
                    help="sensor visibility radius (m); < extent + distance "
                         "gives distant pairs a shrinking lens-shaped "
                         "overlap, the real LoKITTI difficulty")
    ap.add_argument("--arms", default="apr,baseline",
                    help="subset of arms to run (apr | baseline)")
    ap.add_argument("--seed0", type=int, default=0,
                    help="training seed offset for independent repetitions "
                         "(keep < 800: eval scenes use seeds 1000+ and must "
                         "stay disjoint); eval sets are seed0-independent so "
                         "repetitions form paired comparisons")
    args = ap.parse_args()

    from apr_tpu.data.synthetic import synthetic_pair

    train_dists = [float(x) for x in args.train_dists.split(",")]
    eval_dists = [float(x) for x in args.eval_dists.split(",")]

    # held-out scenes (seeds disjoint from training), shared across arms
    eval_sets = {
        dist: [synthetic_pair(1000 + 100 * di + s, n_points=args.eval_points,
                              apc_points=4, distance=dist, extent=args.extent,
                              max_range=args.max_range)
               for s in range(args.eval_pairs)]
        for di, dist in enumerate(eval_dists)
    }

    arms = {}
    for label in args.arms.split(","):
        ratio = 2e-3 if label == "apr" else 0.0
        print(f"# arm={label} loss_ratio={ratio} steps={args.steps} "
              f"train_dists={train_dists} eval_dists={eval_dists}",
              flush=True)
        arms[label] = run_arm(label, make_config(ratio), train_dists,
                              eval_sets, args.steps, args.pool_pairs,
                              args.extent, args.max_range, seed0=args.seed0)

    if {"apr", "baseline"} <= set(arms):
        for dist in eval_dists:
            da = arms["apr"][dist]["recall"]
            db = arms["baseline"][dist]["recall"]
            print(f"DELTA eval_dist={dist} apr={da:.3f} baseline={db:.3f} "
                  f"gain={da - db:+.3f}", flush=True)


if __name__ == "__main__":
    main()
