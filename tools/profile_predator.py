"""Stage split of the Predator eval pipeline on the real chip.

Same single-dispatch scan protocol as bench.py --predator (docs/PERF.md
"Measurement methodology"): K iterations inside one jit program, pyramid
points jittered per iteration from the scan key so nothing hoists, one
scalar readback, min-of-3 timed dispatches per probe to defeat tunnel
noise.  Every probe consumes ALL of its stage's outputs (the recurring
DCE trap — docs/PERF.md).

Stages:
  fwd     KPFCNN forward (encoder + GCN + decoder + heads)
  match   + overlap*saliency Gumbel sampling + feature NN correspondences
  full    + 32k-hypothesis RANSAC + RTE/RRE (the tester step)

Usage: python tools/profile_predator.py [--iters 8] [--caps 16384,4096,2048,1024]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def tree_sum(t):
    leaves = [jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t)]
    return sum(leaves, jnp.zeros(()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--caps", default="16384,4096,2048,1024")
    ap.add_argument("--points", type=int, default=30000)
    args = ap.parse_args()

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import synthetic_pair
    from apr_tpu.eval.predator_tester import PredatorTester
    from apr_tpu.registration.matching import feature_nn_correspondences
    from apr_tpu.training.predator import PredatorTrainer

    caps = tuple(int(x) for x in args.caps.split(","))
    cfg = APRConfig(
        trainer="PredatorTrainer",
        point_capacity=32768,
        kp_capacities=caps,
        neighborhood_limits=(40, 40, 40, 40),
        test_num_ransac_hypotheses=32768,
    )
    trainer = PredatorTrainer(cfg)
    pair = synthetic_pair(seed=0, n_points=args.points, apc_points=4,
                          extent=60.0, distance=15.0)
    tester = PredatorTester(cfg, trainer, None)
    batch0 = tester._pair_to_batch(pair)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    params = state.params
    iters = args.iters

    def jitter_pyramids(batch, k):
        def jit_pyr(pyr, kk):
            lvls = []
            for lv in pyr.levels:
                kk, ku = jax.random.split(kk)
                lvls.append(lv._replace(
                    points=lv.points
                    + jax.random.normal(ku, lv.points.shape) * 1e-4))
            return pyr._replace(levels=tuple(lvls))
        k0, k1 = jax.random.split(k)
        return batch._replace(pyr0=jit_pyr(batch.pyr0, k0),
                              pyr1=jit_pyr(batch.pyr1, k1))

    def fwd_probe(batch, ke):
        out = trainer.model.apply({"params": params["model"]},
                                  batch.pyr0, batch.pyr1)
        return tree_sum(out)

    def match_probe(batch, ke):
        out = trainer.model.apply({"params": params["model"]},
                                  batch.pyr0, batch.pyr1)
        m0 = batch.pyr0.levels[0].mask
        m1 = batch.pyr1.levels[0].mask
        k0, k1 = jax.random.split(ke)

        def weighted_sample(k, scores, mask):
            w = jnp.where(mask, scores, 0.0)
            logw = jnp.log(jnp.maximum(w, 1e-12))
            g = -jnp.log(-jnp.log(
                jax.random.uniform(k, logw.shape, minval=1e-12, maxval=1.0)))
            keys = jnp.where(mask, logw + g, -jnp.inf)
            _, sel = jax.lax.top_k(keys, cfg.test_subsample)
            return jnp.zeros_like(mask).at[sel].set(True) & mask

        s0 = weighted_sample(k0, out.overlap0 * out.saliency0, m0)
        s1 = weighted_sample(k1, out.overlap1 * out.saliency1, m1)
        corr = feature_nn_correspondences(out.feats0, out.feats1, s0, s1)
        return tree_sum((corr.src_idx, corr.tgt_idx, corr.mask))

    def full_probe(batch, ke):
        t_est, rte, rre, fit = tester._step(params, batch, ke)
        return jnp.sum(t_est) + rte + rre + fit

    def scan_time(probe, label):
        @jax.jit
        def run(key, batch):
            def body(carry, k):
                kj, ke = jax.random.split(k)
                return carry + probe(jitter_pyramids(batch, kj), ke), None
            keys = jax.random.split(key, iters)
            acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
            return acc

        t0 = time.time()
        jax.block_until_ready(run(jax.random.PRNGKey(1), batch0))
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(3):
            t0 = time.time()
            jax.block_until_ready(run(jax.random.PRNGKey(2 + i), batch0))
            best = min(best, time.time() - t0)
        ms = best / iters * 1e3
        print(f"{label:<28}{ms:8.1f} ms/pair   (compile {compile_s:.1f}s)",
              file=sys.stderr)
        return ms

    from apr_tpu.models.kpfcnn import KPEncoder, stack_pair

    enc = KPEncoder(cfg.first_feats_dim, cfg.first_subsampling_dl,
                    cfg.conv_radius, cfg.KP_extent, cfg.num_kernel_points,
                    compute_dtype=cfg.compute_dtype)

    def encoder_probe(batch, ke):
        out = enc.apply({"params": params["model"]["encoder"]},
                        stack_pair(batch.pyr0, batch.pyr1))
        return tree_sum(out)

    t_enc = scan_time(encoder_probe, "encoder only (incl skips)")
    t_fwd = scan_time(fwd_probe, "KPFCNN forward")
    t_match = scan_time(match_probe, "+ sampling + feature match")
    t_full = scan_time(full_probe, "full tester step")
    print(f"{'GCN+decoder+heads alone':<28}{t_fwd - t_enc:8.1f} ms/pair",
          file=sys.stderr)
    print(f"{'sample+match alone':<28}{t_match - t_fwd:8.1f} ms/pair",
          file=sys.stderr)
    print(f"{'RANSAC+errors alone':<28}{t_full - t_match:8.1f} ms/pair",
          file=sys.stderr)


if __name__ == "__main__":
    main()
