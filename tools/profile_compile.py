"""Where does the bench cold-compile time go?

Times jax.jit(...).lower(...) (tracing + StableHLO emission) and
.compile() (XLA:TPU backend) separately for each piece of the bench.py
eval pipeline, so compile-time optimization targets the real hog instead
of guesses.  No persistent cache is configured (axon cache hits hang, see
bench.py), so every number is a true cold compile.

Usage: python tools/profile_compile.py [--skip-full]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"# {label:<40}{dt:8.1f} s", file=sys.stderr, flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full bench_scan compile (the slowest)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # no persistent compilation cache: axon cache hits hang (see bench.py)

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer
    from apr_tpu.training.batching import make_pair_batch

    cfg = APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetFatBN",
        model_n_out=128,
        conv1_kernel_size=5,
        voxel_size=0.3,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=8,
        test_num_ransac_hypotheses=32768,
    )
    trainer = get_trainer(cfg)
    pair = synthetic_pair(seed=0, n_points=30000, apc_points=4, extent=60.0,
                          distance=20.0)
    tester = FeatureTester(cfg, trainer, None)
    batch0 = tester._pair_to_batch(pair)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    tester.state = state

    p0, m0 = pad_points(pair["points0"], cfg.point_capacity)
    p1, m1 = pad_points(pair["points1"], cfg.point_capacity)
    raw = (jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
           jnp.asarray(pair["t_gt"]))
    c = cfg
    GROUP = 4

    def group_inputs(key):
        pts0, mask0, pts1, mask1, t_gt = raw
        k0, k1, ke = jax.random.split(key, 3)
        p0g = pts0[None] + jax.random.normal(k0, (GROUP,) + pts0.shape) * 1e-4
        p1g = pts1[None] + jax.random.normal(k1, (GROUP,) + pts1.shape) * 1e-4
        m0g = jnp.broadcast_to(mask0[None], (GROUP,) + mask0.shape)
        m1g = jnp.broadcast_to(mask1[None], (GROUP,) + mask1.shape)
        tg = jnp.broadcast_to(t_gt[None], (GROUP, 4, 4))
        return p0g, m0g, p1g, m1g, tg, ke

    def batch_fn(p0g, m0g, p1g, m1g, tg):
        zeros = jnp.zeros((GROUP, 1, 3))
        zmask = jnp.zeros((GROUP, 1), bool)
        return make_pair_batch(
            p0g, m0g, p1g, m1g, zeros, zmask, zeros, zmask, tg,
            voxel_size=c.voxel_size, capacities=c.capacities,
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
            with_correspondences=False,
        )

    p0g, m0g, p1g, m1g, tg, ke = group_inputs(jax.random.PRNGKey(1))
    gi = (p0g, m0g, p1g, m1g, tg)

    # --- stage A: batch build ------------------------------------------------
    def count_ops(lowered):
        try:
            return lowered.as_text().count("\n")
        except Exception:
            return -1

    jf = jax.jit(batch_fn)
    low, t_trace = timed("A batch build: trace+lower", lambda: jf.lower(*gi))
    print(f"#   (HLO text lines: {count_ops(low)})", file=sys.stderr)
    _, t_comp = timed("A batch build: XLA compile", low.compile)
    batch = jax.block_until_ready(jf(*gi))

    # --- stage B: encoder fwd x2 --------------------------------------------
    def enc_fn(params, bstats, b):
        return trainer._encode_pair(params, bstats, b, False)

    jf = jax.jit(enc_fn)
    low, _ = timed("B encoder fwd x2: trace+lower",
                   lambda: jf.lower(state.params, state.batch_stats, batch))
    print(f"#   (HLO text lines: {count_ops(low)})", file=sys.stderr)
    timed("B encoder fwd x2: XLA compile", low.compile)
    f0, f1, _ = jax.block_until_ready(
        jf(state.params, state.batch_stats, batch))

    # --- stage C: match + RANSAC + errors (vmapped x GROUP) -----------------
    def eval_fn(params, bstats, f0, f1, b, ke):
        keys = jax.random.split(ke, GROUP)
        return jax.vmap(
            tester._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(params, bstats, f0, f1, b.xyz0, b.xyz1,
          b.pyramid0.levels[0].mask, b.pyramid1.levels[0].mask, b.t_gt, keys)

    jf = jax.jit(eval_fn)
    low, _ = timed("C match+RANSAC: trace+lower",
                   lambda: jf.lower(state.params, state.batch_stats,
                                    f0, f1, batch, ke))
    print(f"#   (HLO text lines: {count_ops(low)})", file=sys.stderr)
    timed("C match+RANSAC: XLA compile", low.compile)

    # --- stage D: one full group (A+B+C fused) -------------------------------
    def one_group(key):
        p0g, m0g, p1g, m1g, tg, ke = group_inputs(key)
        b = batch_fn(p0g, m0g, p1g, m1g, tg)
        f0, f1, _ = trainer._encode_pair(state.params, state.batch_stats,
                                         b, False)
        return eval_fn(state.params, state.batch_stats, f0, f1, b, ke)

    jf = jax.jit(one_group)
    low, _ = timed("D full group (fused): trace+lower",
                   lambda: jf.lower(jax.random.PRNGKey(1)))
    print(f"#   (HLO text lines: {count_ops(low)})", file=sys.stderr)
    timed("D full group (fused): XLA compile", low.compile)

    if args.skip_full:
        return

    # --- stage E: the bench scan (32 iterations of D in a lax.scan) ---------
    def bench_scan(key):
        def body(carry, k):
            t_est, rte, rre, fit = one_group(k)
            return carry + jnp.sum(rte), (rte, rre)
        keys = jax.random.split(key, 32)
        return jax.lax.scan(body, jnp.zeros(()), keys)

    jf = jax.jit(bench_scan)
    low, _ = timed("E bench scan: trace+lower",
                   lambda: jf.lower(jax.random.PRNGKey(1)))
    print(f"#   (HLO text lines: {count_ops(low)})", file=sys.stderr)
    timed("E bench scan: XLA compile", low.compile)


if __name__ == "__main__":
    main()
