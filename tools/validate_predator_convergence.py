"""End-to-end Predator-APR training-quality validation on synthetic scenes.

Trains the full Predator recipe (circle + overlap/saliency BCE + NPR
generative branch) from scratch on synthetic LiDAR-like pairs and evaluates
registration recall on HELD-OUT scenes with the reference eval protocol
(overlap*saliency-weighted sampling + feature-NN matching + RANSAC,
Predator_APR/lib/tester.py:33-141).  The Predator twin of
tools/validate_convergence.py — rerun whenever the KPConv numerics change
(all-K contraction, bf16 compute, windowed radius tables, ...).

    python tools/validate_predator_convergence.py [--steps 400]
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
    ap.add_argument("--train_pairs", type=int, default=8)
    ap.add_argument("--eval_pairs", type=int, default=8)
    ap.add_argument("--compute", default=None,
                    help="override compute_dtype (float32 | bfloat16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval.predator_tester import PredatorTester
    from apr_tpu.training.predator import PredatorTrainer, make_kp_pair_batch

    cfg = APRConfig(
        trainer="PredatorTrainer",
        final_feats_dim=32,
        first_feats_dim=64,
        gnn_feats_dim=64,
        generator_model="GenerativeMLP_54",
        point_generation_ratio=2,
        first_subsampling_dl=0.5,
        conv_radius=2.5,
        point_capacity=16384,
        apc_capacity=16384,
        kp_capacities=(8192, 2048, 1024, 512),
        neighborhood_limits=(24, 24, 24, 24),
        pos_radius=0.6, safe_radius=1.5, overlap_radius=0.6,
        matchability_radius=0.6, max_points=256,
        optimizer="SGD", lr=0.05, sgd_momentum=0.98, exp_gamma=0.99,
        test_subsample=2500, test_num_ransac_hypotheses=32768,
        test_ransac_dist_thresh=0.6,
    )
    if args.compute:
        cfg.compute_dtype = args.compute

    trainer = PredatorTrainer(cfg)

    def to_batch(pair):
        p0, m0 = pad_points(pair["points0"], cfg.point_capacity)
        p1, m1 = pad_points(pair["points1"], cfg.point_capacity)
        a0, am0 = pad_points(pair["apc0"], cfg.apc_capacity)
        a1, am1 = pad_points(pair["apc1"], cfg.apc_capacity)
        return make_kp_pair_batch(
            jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1),
            jnp.asarray(m1), jnp.asarray(a0), jnp.asarray(am0),
            jnp.asarray(a1), jnp.asarray(am1), jnp.asarray(pair["t_gt"]),
            first_subsampling_dl=cfg.first_subsampling_dl,
            conv_radius=cfg.conv_radius, capacities=cfg.kp_capacities,
            neighbor_limits=cfg.neighborhood_limits,
            overlap_radius=cfg.overlap_radius,
        )

    print(f"# building {args.train_pairs} train batches...", flush=True)
    batches = []
    for i in range(args.train_pairs):
        pair = synthetic_pair(seed=i, n_points=12000, apc_points=24000,
                              extent=30.0, distance=args.distance)
        batches.append(to_batch(pair))

    state = trainer.init_state(jax.random.PRNGKey(0), batches[0])
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    loss = None
    for step in range(args.steps):
        key, k = jax.random.split(key)
        b = batches[step % len(batches)]
        # saliency joins once features register at all (reference latch is
        # val-recall-gated; synthetic scenes register early, keep it simple)
        w_sal = 1.0 if step > args.steps // 2 else 0.0
        state, m = trainer.train_step(state, b, k, jnp.asarray(w_sal))
        if step % 50 == 0 or step == args.steps - 1:
            loss = float(m["loss"])
            print(f"# step {step:4d} loss {loss:.4f} circle "
                  f"{float(m['circle_loss']):.4f} recall "
                  f"{float(m['recall']):.3f}", flush=True)
            assert np.isfinite(loss)
    print(f"# trained {args.steps} steps in {time.time() - t0:.0f}s",
          flush=True)

    tester = PredatorTester(cfg, trainer, state)
    succ, rtes, rres = [], [], []
    key = jax.random.PRNGKey(7)
    for i in range(args.eval_pairs):
        pair = synthetic_pair(seed=1000 + i, n_points=12000, apc_points=4,
                              extent=30.0, distance=args.distance)
        b = tester._pair_to_batch(pair)
        key, k = jax.random.split(key)
        _, rte, rre, fit = tester._step(state.params, b, k)
        rte, rre = float(rte), float(rre)
        succ.append(rte < 2.0 and rre < 5.0)
        rtes.append(rte)
        rres.append(rre)
        print(f"# eval pair {i}: RTE {rte:.3f} m RRE {rre:.2f} deg "
              f"{'OK' if succ[-1] else 'FAIL'}", flush=True)
    recall = float(np.mean(succ))
    print(f"RESULT recall {recall:.3f} median_rte {np.median(rtes):.3f} "
          f"median_rre {np.median(rres):.3f} on {args.eval_pairs} held-out "
          f"pairs at {args.distance} m")


if __name__ == "__main__":
    main()
