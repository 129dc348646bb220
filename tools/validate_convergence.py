"""End-to-end training-quality validation on synthetic scenes.

Trains the full APR recipe (contrastive + NPR generative branch) from
scratch on synthetic LiDAR-like pairs and evaluates registration recall on
HELD-OUT scenes with the reference eval protocol (feature-NN matching +
RANSAC).  Exists to revalidate the training defaults end-to-end on the real
chip whenever the numerics change (bf16 compute, chamfer backend, adjoint
backward, ...).

    python tools/validate_convergence.py [--steps 400] [--distance 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--distance", type=float, default=8.0)
    ap.add_argument("--eval_pairs", type=int, default=8)
    ap.add_argument("--chamfer", default=None,
                    help="override chamfer_mode (default: config default)")
    ap.add_argument("--compute", default=None,
                    help="override compute_dtype (float32 | bfloat16)")
    args = ap.parse_args()
    # NOTE: with a CONSTANT LR this protocol overfits the 8 training pairs
    # past ~400 steps (held-out recall 0.875 @400 but ~0.3 @1600 for BOTH
    # f32 and bf16 — a schedule/data effect, not numerics).  The loop now
    # applies the production exp_gamma decay every 25 steps.

    import jax
    import jax.numpy as jnp

    # no persistent compilation cache: axon cache hits hang (see bench.py)

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer, make_pair_batch

    kw = {}
    if args.chamfer:
        kw["chamfer_mode"] = args.chamfer
    if args.compute:
        kw["compute_dtype"] = args.compute
    cfg = APRConfig(
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
        test_num_ransac_hypotheses=16384,
        test_subsample=4000,
        **kw,
    )
    print(f"# chamfer={cfg.chamfer_mode} compute={cfg.compute_dtype} "
          f"steps={args.steps} dist={args.distance}", flush=True)
    trainer = get_trainer(cfg)

    def build(seeds):
        cols = [[] for _ in range(9)]
        for s in seeds:
            d = synthetic_pair(s, n_points=7000, apc_points=7000,
                               distance=args.distance, extent=30.0)
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

    train_batches = [build((2 * i, 2 * i + 1)) for i in range(4)]
    state = trainer.init_state(jax.random.PRNGKey(0), train_batches[0])

    t0 = time.time()
    steps_per_epoch = 25  # exp_gamma decay cadence (production decays/epoch)
    for step in range(args.steps):
        if step % steps_per_epoch == 0:
            state = trainer.set_lr(state, step // steps_per_epoch)
        key = jax.random.PRNGKey(step)
        state, metrics = trainer.train_step(
            state, train_batches[step % len(train_batches)], key)
        if (step + 1) % 100 == 0:
            print(f"step {step + 1}: loss={float(metrics['loss']):.4f} "
                  f"chamfer={float(metrics.get('chamfer_loss', 0.0)):.4f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out eval (seeds disjoint from training)
    tester = FeatureTester(cfg, trainer, state)
    pairs = [synthetic_pair(1000 + s, n_points=7000, apc_points=4,
                            distance=args.distance, extent=30.0)
             for s in range(args.eval_pairs)]
    stats = tester.test(pairs, pipelined=False)
    s = stats.summary()
    print(f"RESULT recall={s['recall']:.3f} "
          f"rte_mean={s.get('rte_mean', float('nan')):.3f} "
          f"rre_mean={s.get('rre_mean', float('nan')):.3f} "
          f"n={s['n_pairs']}")


if __name__ == "__main__":
    main()
