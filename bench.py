"""End-to-end benchmark: distant-pair feature extraction + registration.

Prints ONE JSON line:
    {"metric": "pairs_per_sec", "value": N, "unit": "pairs/s", "vs_baseline": R}

Protocol (mirrors the reference test pipeline, FCGF_APR/scripts/test_apr.py):
per pair — voxelize both 30k-pt clouds (0.3 m), build 4-level pyramids,
ResUNetFatBN(128) forward x2, 5000-point subsample, feature-NN
correspondences, 32768-hypothesis RANSAC, pose errors.  Weights are random
(throughput is weight-independent).

Measurement: the WHOLE pipeline runs as the body of one lax.scan over K
iterations inside a single jit dispatch, with per-iteration key-dependent
point jitter so no stage can be hoisted.  One dispatch = one host<->device
round trip, so the number reflects device throughput rather than the
host-tunnel latency of this environment (which varies 1000x between runs;
eval in production uses the same pipelining — see FeatureTester.test).

Baseline: the reference pipeline on an A100 + CPU Open3D RANSAC (4M iters,
10k confidence) is estimated at ~0.5 pairs/sec (RANSAC-dominated; no absolute
number is published — BASELINE.md).  The north-star target is 2x A100, i.e.
1.0 pairs/sec, so vs_baseline = measured / 1.0.
"""

import argparse
import json
import sys
import time

import numpy as np

TARGET_PAIRS_PER_SEC = 1.0  # 2x the estimated A100 reference pipeline
SCAN_ITERS = 32
V5E_PEAK_BF16 = 197e12  # MXU peak, bf16 with f32 accumulation


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true",
                    help="also print per-stage accounting to stderr")
    ap.add_argument("--predator", action="store_true",
                    help="bench the Predator eval pipeline instead of FCGF")
    ap.add_argument("--group", type=int, default=4,
                    help="pairs per jit step (FCGF pipeline)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # NO persistent compilation cache: on this box's axon (tunneled-TPU)
    # backend a cache HIT hangs executable loading (measured 2026-08-18: a
    # program that compiles cold in 4.9 s hangs > 280 s when loaded from a
    # populated jax_compilation_cache_dir).  The 429-505 s "cold compiles"
    # recorded in rounds 2-3 were such stalls; a true cold compile of the
    # whole bench program is ~90-120 s (docs/PERF.md).

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.training import get_trainer
    from apr_tpu.training.batching import make_pair_batch

    if args.predator:
        _bench_predator(jax, jnp)
        return

    cfg = APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetFatBN",
        model_n_out=128,
        conv1_kernel_size=5,
        voxel_size=0.3,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=8,  # unused at test time (decoder discarded)
        test_num_ransac_hypotheses=32768,
    )
    trainer = get_trainer(cfg)

    print("# generating pair...", file=sys.stderr, flush=True)
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
    GROUP = args.group  # pairs per jit step: the encoder's gathers are
    # op-overhead bound on TPU (batch 4 costs ~the same as batch 1 —
    # docs/PERF.md), so production eval batches pairs; the scan measures
    # grouped throughput

    def one_group(key, pts0, mask0, pts1, mask1, t_gt):
        # key-dependent jitter on BOTH clouds of EVERY group member defeats
        # loop-invariant hoisting while being geometrically negligible
        # (0.1 mm); the group stacks GROUP jittered instances
        k_j0, k_j1, k_e = jax.random.split(key, 3)
        p0 = pts0[None] + jax.random.normal(
            k_j0, (GROUP,) + pts0.shape) * 1e-4
        p1 = pts1[None] + jax.random.normal(
            k_j1, (GROUP,) + pts1.shape) * 1e-4
        m0 = jnp.broadcast_to(mask0[None], (GROUP,) + mask0.shape)
        m1 = jnp.broadcast_to(mask1[None], (GROUP,) + mask1.shape)
        tg = jnp.broadcast_to(t_gt[None], (GROUP, 4, 4))
        zeros = jnp.zeros((GROUP, 1, 3))
        zmask = jnp.zeros((GROUP, 1), bool)
        batch = make_pair_batch(
            p0, m0, p1, m1, zeros, zmask, zeros, zmask, tg,
            voxel_size=c.voxel_size, capacities=c.capacities,
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
            with_correspondences=False,
        )
        f0, f1, _ = trainer._encode_pair(state.params, state.batch_stats,
                                         batch, False)
        keys = jax.random.split(k_e, GROUP)
        return jax.vmap(
            tester._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(state.params, state.batch_stats, f0, f1,
          batch.xyz0, batch.xyz1,
          batch.pyramid0.levels[0].mask, batch.pyramid1.levels[0].mask,
          batch.t_gt, keys)

    @jax.jit
    def bench_scan(key, raw):
        pts0, mask0, pts1, mask1, t_gt = raw

        def body(carry, k):
            t_est, rte, rre, fit = one_group(
                k, pts0, mask0, pts1, mask1, t_gt)
            return carry + jnp.sum(rte), (rte, rre)

        keys = jax.random.split(key, SCAN_ITERS)
        acc, outs = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc, outs

    t0 = time.time()
    acc, outs = bench_scan(jax.random.PRNGKey(1), raw)
    jax.block_until_ready(acc)
    compile_s = time.time() - t0
    print(f"# compiled+first run in {compile_s:.1f}s", file=sys.stderr,
          flush=True)

    t0 = time.time()
    acc, outs = bench_scan(jax.random.PRNGKey(2), raw)
    jax.block_until_ready(acc)
    dt = time.time() - t0
    n_pairs = SCAN_ITERS * GROUP
    value = n_pairs / dt

    # MFU from XLA's own flop count of the whole compiled pipeline
    mfu = None
    try:
        ca = bench_scan.lower(jax.random.PRNGKey(2), raw).compile()
        ca = ca.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / dt / V5E_PEAK_BF16
    except Exception:  # cost_analysis availability varies by backend
        pass

    print(
        json.dumps(
            {
                "metric": "pairs_per_sec",
                "value": round(value, 4),
                "unit": "pairs/s",
                "vs_baseline": round(value / TARGET_PAIRS_PER_SEC, 4),
                # tracked so compile-time regressions stay visible round to
                # round (true cold compile ~90-120 s; the r2 505 s was a
                # persistent-cache stall, root-caused and removed)
                "compile_s": round(compile_s, 1),
            }
        )
    )
    print(
        f"# detail: {SCAN_ITERS} iterations x {GROUP}-pair groups in one "
        f"dispatch, {dt:.3f}s total ({dt / n_pairs * 1e3:.1f} ms/pair); "
        f"compile {compile_s:.1f}s"
        + (f"; MFU ~{mfu * 100:.2f}% of v5e bf16 peak (gather-bound "
           f"pipeline, see docs/PERF.md)" if mfu else ""),
        file=sys.stderr,
    )

    if args.stages:
        # truncated pipelines, same scan protocol; deltas are stage costs.
        # The tunnel to this box's TPU adds one-sided noise that varies by
        # the minute, so every probe takes the MIN of 3 timed dispatches and
        # the full pipeline is re-measured contemporaneously — otherwise a
        # subset probe can "cost more" than the total it is a subset of
        # (observed: prep+encode 128.3 ms/pair vs a 99.1 total measured
        # minutes earlier).
        def _min_of(run, n=3):
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                jax.block_until_ready(run(jax.random.PRNGKey(2), raw))
                best = min(best, time.time() - t0)
            return best / (SCAN_ITERS * GROUP) * 1e3

        def stage_scan(fn, label):
            @jax.jit
            def run(key, raw):
                def body(c, k):
                    return c + fn(k, raw), None
                keys = jax.random.split(key, SCAN_ITERS)
                acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
                return acc
            jax.block_until_ready(run(jax.random.PRNGKey(2), raw))  # compile
            ms = _min_of(run)
            print(f"# stage {label:<24}{ms:8.1f} ms/pair", file=sys.stderr)
            return ms

        def prep_only(k, raw):
            # DCE-proof: consume EVERY map of both pyramids — reading one
            # coord lets XLA delete the whole kernel-map build (the round-1
            # pyramid-probe trap, docs/PERF.md; re-found in round 3 when
            # this probe reported 1.7 ms/pair while the true cost was 44.8)
            b = _make_batch(k, raw)
            s = jnp.zeros((), jnp.float32)
            for pyr in (b.pyramid0, b.pyramid1):
                for lv in pyr.levels:
                    s += lv.keys.sum() + lv.mask.sum()
                for m in pyr.same_maps + pyr.down_maps + pyr.up_maps:
                    s += m.sum()
                s += pyr.conv1_map.sum()
            return (s + b.feats0.sum() + b.xyz0.sum()
                    + b.feats1.sum() + b.xyz1.sum())

        def prep_encode(k, raw):
            b = _make_batch(k, raw)
            f0, f1, _ = trainer._encode_pair(state.params, state.batch_stats,
                                             b, False)
            return jnp.mean(f0) + jnp.mean(f1)

        def _make_batch(key, raw):
            pts0, mask0, pts1, mask1, t_gt = raw
            k0, k1, _ = jax.random.split(key, 3)
            p0 = pts0[None] + jax.random.normal(
                k0, (GROUP,) + pts0.shape) * 1e-4
            p1 = pts1[None] + jax.random.normal(
                k1, (GROUP,) + pts1.shape) * 1e-4
            m0 = jnp.broadcast_to(mask0[None], (GROUP,) + mask0.shape)
            m1 = jnp.broadcast_to(mask1[None], (GROUP,) + mask1.shape)
            tg = jnp.broadcast_to(t_gt[None], (GROUP, 4, 4))
            zeros = jnp.zeros((GROUP, 1, 3))
            zmask = jnp.zeros((GROUP, 1), bool)
            return make_pair_batch(
                p0, m0, p1, m1, zeros, zmask, zeros, zmask, tg,
                voxel_size=c.voxel_size, capacities=c.capacities,
                conv1_kernel_size=c.conv1_kernel_size,
                corr_cap=c.corr_capacity_per_point,
                search_multiplier=c.positive_pair_search_voxel_size_multiplier,
                with_correspondences=False,
            )

        t_prep = stage_scan(prep_only, "voxelize+pyramid")
        t_enc = stage_scan(prep_encode, "+ encoder fwd x2")

        @jax.jit
        def run_full(key, raw):  # full pipeline, same min-of-3 protocol
            return bench_scan(key, raw)[0]

        jax.block_until_ready(run_full(jax.random.PRNGKey(2), raw))
        total_ms = _min_of(run_full)
        print(f"# stage {'encoder alone':<24}{t_enc - t_prep:8.1f} ms/pair",
              file=sys.stderr)
        print(f"# stage {'match+RANSAC+errors':<24}{total_ms - t_enc:8.1f}"
              f" ms/pair (total {total_ms:.1f}, min-of-3 contemporaneous)",
              file=sys.stderr)


def _bench_predator(jax, jnp):
    """Predator eval pipeline throughput: KPFCNN forward +
    overlap*saliency Gumbel sampling + RANSAC, one pair per scan step
    (reference Predator_APR/lib/tester.py:33-141 protocol)."""
    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import synthetic_pair
    from apr_tpu.eval.predator_tester import PredatorTester
    from apr_tpu.training.predator import PredatorTrainer

    cfg = APRConfig(
        trainer="PredatorTrainer",
        point_capacity=32768,
        kp_capacities=(16384, 4096, 2048, 1024),
        neighborhood_limits=(40, 40, 40, 40),
        test_num_ransac_hypotheses=32768,
    )
    trainer = PredatorTrainer(cfg)
    pair = synthetic_pair(seed=0, n_points=30000, apc_points=4, extent=60.0,
                          distance=15.0)
    tester = PredatorTester(cfg, trainer, None)
    batch0 = tester._pair_to_batch(pair)
    state = trainer.init_state(jax.random.PRNGKey(0), batch0)
    params = state.params
    step = tester._step

    iters = 8  # KPFCNN at 16k superpoints is heavier than FCGF eval

    def jitter_pyramids(batch, k):
        # key-dependent 0.1 mm point jitter on every level so the KPFCNN
        # forward cannot be hoisted out of the scan (tables stay valid)
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

    @jax.jit
    def bench_scan(key, batch):
        def body(carry, k):
            kj, ke = jax.random.split(k)
            _, rte, _, _ = step(params, jitter_pyramids(batch, kj), ke)
            return carry + rte, None
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    t0 = time.time()
    acc = bench_scan(jax.random.PRNGKey(1), batch0)
    jax.block_until_ready(acc)
    compile_s = time.time() - t0
    t0 = time.time()
    acc = bench_scan(jax.random.PRNGKey(2), batch0)
    jax.block_until_ready(acc)
    dt = time.time() - t0
    value = iters / dt
    print(json.dumps({
        "metric": "predator_pairs_per_sec",
        "value": round(value, 4),
        "unit": "pairs/s",
        "vs_baseline": round(value / TARGET_PAIRS_PER_SEC, 4),
        "compile_s": round(compile_s, 1),
    }))
    print(f"# detail: {iters} predator-eval iterations in one dispatch, "
          f"{dt:.3f}s ({dt / iters * 1e3:.1f} ms/pair); compile "
          f"{compile_s:.1f}s", file=sys.stderr)

    # honest accounting: the scan above re-uses the pyramid tables (the
    # reference's protocol pays that cost in CPU dataloader workers); the
    # device-side build is measured separately so the serial (single-chip,
    # no prefetch overlap) number is also on record
    from apr_tpu.data.synthetic import pad_points
    from apr_tpu.training.predator import make_kp_pair_batch

    p0, m0 = pad_points(pair["points0"], cfg.point_capacity)
    p1, m1 = pad_points(pair["points1"], cfg.point_capacity)
    z = jnp.zeros((1, 3)); zm = jnp.zeros((1,), bool)
    raw0 = jnp.asarray(p0)

    def tree_sum(t):
        return sum((jnp.sum(a.astype(jnp.float32))
                    for a in jax.tree.leaves(t)), jnp.zeros(()))

    @jax.jit
    def build_scan(key):
        def body(c, k):
            jp0 = raw0 + jax.random.normal(k, raw0.shape) * 1e-4
            b = make_kp_pair_batch(
                jp0, jnp.asarray(m0), jnp.asarray(p1), jnp.asarray(m1),
                z, zm, z, zm, jnp.asarray(pair["t_gt"]),
                first_subsampling_dl=cfg.first_subsampling_dl,
                conv_radius=cfg.conv_radius, capacities=cfg.kp_capacities,
                neighbor_limits=cfg.neighborhood_limits,
                overlap_radius=cfg.overlap_radius)
            return c + tree_sum(b), None
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    jax.block_until_ready(build_scan(jax.random.PRNGKey(5)))
    t0 = time.time()
    jax.block_until_ready(build_scan(jax.random.PRNGKey(6)))
    build_ms = (time.time() - t0) / iters * 1e3
    total_ms = dt / iters * 1e3 + build_ms
    print(f"# detail: + device-side batch build {build_ms:.1f} ms/pair "
          f"(DCE-proof); build-inclusive serial = {total_ms:.1f} ms/pair = "
          f"{1e3 / total_ms:.2f} pairs/s (the training/eval loops overlap "
          f"the build via a producer thread)", file=sys.stderr)


if __name__ == "__main__":
    main()
