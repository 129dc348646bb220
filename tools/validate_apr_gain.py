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

APC targets are multi-viewpoint by default (``--apc_complement_dist 10``):
complement frames rendered from shifted sensor origins with visibility
culling, registered + cropped into the key frame — the reference's APG
structure (complement_data_loader.py:518-632), NOT same-viewpoint
densification.

    python tools/validate_apr_gain.py [--steps 1500] [--eval_pairs 24]
        [--pool_pairs 96] [--train_dists 6,10,14,18] [--eval_dists 12,25,32]
        [--seeds 5]

The in-range 12 m eval set is the control: the paper's claim is that the
gain concentrates on the distant (out-of-range) sets.

Analysis is PAIRED: both arms are evaluated on identical pair lists, so the
per-distance verdict uses discordant-pair counts and an exact McNemar
binomial test pooled over the ``--seeds`` repetitions (each repetition = a
disjoint training-scene pool via internally strided seeds; eval pairs are
shared across repetitions, so pooling is stratified by repetition).
Prints one RESULT line per arm per repetition plus pooled PAIRED lines.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EVAL_SEED_BASE = 1000  # eval scene seeds live at 1000+; train seeds must stay below


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
            extent, max_range, apc_complement_dist, seed0=0,
            lidar_structured=False):
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
                               max_range=max_range,
                               apc_complement_dist=apc_complement_dist,
                               lidar_structured=lidar_structured)
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
    # encoder can memorize vs. generalize.  Scene seeds are strided by
    # seed0 * pool_pairs so consecutive seed0 values draw fully DISJOINT
    # scene pools (repetitions would otherwise share pool_pairs - 1 scenes
    # and be near-duplicates).
    scene_base = seed0 * pool_pairs
    assert scene_base + pool_pairs <= EVAL_SEED_BASE, (
        f"training scene seeds [{scene_base}, {scene_base + pool_pairs}) "
        f"would overlap the eval seed range ({EVAL_SEED_BASE}+): lower "
        f"--seed0 or --pool_pairs")
    n_batches = max(pool_pairs // 2, 1)
    train_batches = [
        build([(scene_base + 2 * i, train_dists[(2 * i) % len(train_dists)]),
               (scene_base + 2 * i + 1,
                train_dists[(2 * i + 1) % len(train_dists)])])
        for i in range(n_batches)
    ]
    # distinct streams for init vs per-step sampling randomness: fold_in
    # never collides with any step key (steps fold in step + 1 >= 1)
    root_key = jax.random.PRNGKey(seed0)
    state = trainer.init_state(jax.random.fold_in(root_key, 0),
                               train_batches[0])

    t0 = time.time()
    steps_per_epoch = 25
    for step in range(steps):
        if step % steps_per_epoch == 0:
            state = trainer.set_lr(state, step // steps_per_epoch)
        key = jax.random.fold_in(root_key, step + 1)
        state, metrics = trainer.train_step(
            state, train_batches[step % len(train_batches)], key)
        if (step + 1) % 100 == 0:
            print(f"# [{label} seed0={seed0}] step {step + 1}: "
                  f"loss={float(metrics['loss']):.4f} "
                  f"chamfer={float(metrics.get('chamfer_loss', 0.0)):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    tester = FeatureTester(cfg, trainer, state)
    results = {}
    for dist, pairs in eval_sets.items():
        stats = tester.test(pairs, pipelined=False)
        s = stats.summary()
        results[dist] = {
            "summary": s,
            "success": np.asarray(stats.success, dtype=bool),
        }
        print(f"RESULT arm={label} seed0={seed0} eval_dist={dist} "
              f"recall={s['recall']:.3f} "
              f"rte_mean={s.get('rte_mean', float('nan')):.3f} "
              f"rre_mean={s.get('rre_mean', float('nan')):.3f} "
              f"n={s['n_pairs']}", flush=True)
    return results


def mcnemar_exact_p(n01: int, n10: int) -> float:
    """Two-sided exact McNemar test: under H0 the n01+n10 discordant pairs
    split Binomial(n, 1/2); p = 2 * P(X <= min(n01, n10)), capped at 1."""
    n = n01 + n10
    if n == 0:
        return 1.0
    k = min(n01, n10)
    cdf = sum(math.comb(n, i) for i in range(k + 1)) / (2.0 ** n)
    return min(1.0, 2.0 * cdf)


def paired_delta_ci(n01: int, n10: int, n: int, z: float = 1.96):
    """Wald CI for the paired recall difference (n10 - n01) / n."""
    if n == 0:
        return 0.0, 0.0, 0.0
    d = (n10 - n01) / n
    se = math.sqrt(max(n01 + n10 - (n10 - n01) ** 2 / n, 0.0)) / n
    return d, d - z * se, d + z * se


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
    ap.add_argument("--apc_complement_dist", type=float, default=10.0,
                    help="complement-frame spacing for multi-viewpoint APC "
                         "targets (reference complement_pair_dist, "
                         "train_apr_kitti.sh:21); 0 = legacy same-viewpoint "
                         "densification")
    ap.add_argument("--lidar_structured", action="store_true",
                    help="spherical depth-buffer scans (rings + occlusion "
                         "+ geometric range falloff) instead of Bernoulli-"
                         "thinned uniform sampling — the round-5 arm "
                         "testing the structure hypothesis the round-4 "
                         "null left open (docs/PERF.md)")
    ap.add_argument("--arms", default="apr,baseline",
                    help="subset of arms to run (apr | baseline)")
    ap.add_argument("--seeds", type=int, default=1,
                    help="independent repetitions seed0..seed0+seeds-1, "
                         "each with a disjoint training-scene pool; pooled "
                         "paired analysis printed at the end")
    ap.add_argument("--seed0", type=int, default=0,
                    help="first repetition index; training scene seeds are "
                         "strided internally (seed0 * pool_pairs) so "
                         "consecutive values give disjoint pools, and an "
                         "assert enforces disjointness from the eval range")
    args = ap.parse_args()

    from apr_tpu.data.synthetic import synthetic_pair

    train_dists = [float(x) for x in args.train_dists.split(",")]
    eval_dists = [float(x) for x in args.eval_dists.split(",")]

    # held-out scenes (seeds disjoint from training), shared across arms AND
    # across repetitions — identical pair lists make the analysis paired
    eval_sets = {
        dist: [synthetic_pair(EVAL_SEED_BASE + 100 * di + s,
                              n_points=args.eval_points,
                              apc_points=4, distance=dist, extent=args.extent,
                              max_range=args.max_range,
                              lidar_structured=args.lidar_structured)
               for s in range(args.eval_pairs)]
        for di, dist in enumerate(eval_dists)
    }

    arm_labels = args.arms.split(",")
    # per arm per dist: list over repetitions of per-pair success vectors
    outcomes = {lab: {d: [] for d in eval_dists} for lab in arm_labels}
    for rep in range(args.seeds):
        seed0 = args.seed0 + rep
        for label in arm_labels:
            ratio = 2e-3 if label == "apr" else 0.0
            print(f"# arm={label} seed0={seed0} loss_ratio={ratio} "
                  f"steps={args.steps} train_dists={train_dists} "
                  f"eval_dists={eval_dists} "
                  f"apc_complement_dist={args.apc_complement_dist}",
                  flush=True)
            res = run_arm(label, make_config(ratio), train_dists,
                          eval_sets, args.steps, args.pool_pairs,
                          args.extent, args.max_range,
                          args.apc_complement_dist, seed0=seed0,
                          lidar_structured=args.lidar_structured)
            for d in eval_dists:
                outcomes[label][d].append(res[d]["success"])

    if {"apr", "baseline"} <= set(arm_labels):
        print(f"# paired pooled analysis over {args.seeds} repetition(s), "
              f"n = seeds x eval_pairs per distance", flush=True)
        for dist in eval_dists:
            a = np.concatenate(outcomes["apr"][dist])
            b = np.concatenate(outcomes["baseline"][dist])
            assert a.shape == b.shape
            n = len(a)
            n10 = int(np.sum(a & ~b))   # apr succeeded, baseline failed
            n01 = int(np.sum(~a & b))   # baseline succeeded, apr failed
            d, lo, hi = paired_delta_ci(n01, n10, n)
            p = mcnemar_exact_p(n01, n10)
            print(f"PAIRED eval_dist={dist} apr={a.mean():.3f} "
                  f"baseline={b.mean():.3f} delta={d:+.3f} "
                  f"ci95=[{lo:+.3f},{hi:+.3f}] "
                  f"discordant={n10}/{n01} (apr-only/baseline-only) "
                  f"mcnemar_p={p:.4f} n={n}", flush=True)


if __name__ == "__main__":
    main()
