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
import hashlib
import json
import os
import pickle
import sys
import time

import numpy as np

TARGET_PAIRS_PER_SEC = 1.0  # 2x the estimated A100 reference pipeline
SCAN_ITERS = 32
V5E_PEAK_BF16 = 197e12  # MXU peak, bf16 with f32 accumulation
V5E_HBM_BYTES_PER_S = 819e9  # v5e HBM bandwidth roofline

_AOT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".aot_cache")
# LRU budget: each config sweep mints a 100-210 MB entry and nothing ever
# died, so the cache grew to ~1 GB by round 4; cap it and evict by access
# time (hits refresh mtime below)
_AOT_BUDGET_BYTES = 800 * 1024 * 1024


def _evict_aot_cache(budget=_AOT_BUDGET_BYTES):
    """Drop least-recently-USED cache entries until under budget."""
    try:
        entries = []
        for name in os.listdir(_AOT_DIR):
            if not name.endswith(".pkl"):
                continue
            p = os.path.join(_AOT_DIR, name)
            st = os.stat(p)
            entries.append((st.st_mtime, st.st_size, p))
        total = sum(s for _, s, _ in entries)
        for mt, size, p in sorted(entries):
            if total <= budget:
                break
            os.remove(p)
            total -= size
            print(f"# aot cache evicted {os.path.basename(p)} "
                  f"({size / 1e6:.0f} MB, lru)", file=sys.stderr)
    except Exception as e:  # hygiene must never break the bench
        print(f"# aot cache eviction failed ({e!r})", file=sys.stderr)


def aot_compile(fn, example_args, tag, phases):
    """Compile ``jax.jit(fn)`` for ``example_args`` with phase-split timing
    and a disk AOT-executable cache.

    Phase-split (recorded into ``phases[tag]``): ``trace_s`` = host-side
    trace+lower to StableHLO (no backend involved), ``xla_s`` = backend
    compile RPC, or ``load_s`` = executable deserialize on a cache hit.
    This separates "our program is big" from "the tunnel/backend stalled" —
    the round-3 driver recorded a 1058.5 s cold compile vs the 89-278 s
    spread measured interactively, and the un-split number could not say
    which phase ate it.

    The cache uses jax.experimental.serialize_executable (measured on this
    box's axon backend: deserialize+load 0.01 s, outputs bit-identical),
    NOT jax_compilation_cache_dir, whose cache-HIT executable loading hangs
    >280 s here (root-caused round 3, see docs/PERF.md).  Keyed by
    sha256(StableHLO text) + jax version + device kind, so any change to
    the program, library, or hardware forces a fresh compile; stale entries
    can never serve wrong results.
    """
    import jax

    p = phases.setdefault(tag, {})
    jitted = jax.jit(fn)
    t0 = time.time()
    lowered = jitted.lower(*example_args)
    hlo_text = lowered.as_text()
    p["trace_s"] = round(time.time() - t0, 1)
    path = None
    try:
        # the fingerprint is deterministic for a fixed code state
        # (verified round 5: identical hashes across fresh processes) but
        # changes when ANY op in the traced path changes — a sweep/config
        # edit mints a new entry, which is why the cache is LRU-bounded
        fp = hashlib.sha256(hlo_text.encode()).hexdigest()[:16]
        dev = jax.devices()[0].device_kind.replace(" ", "_")
        path = os.path.join(
            _AOT_DIR, f"{tag}_{jax.__version__}_{dev}_{fp}.pkl")
    except Exception as e:  # fingerprinting must never break the bench
        print(f"# aot fingerprint failed ({e!r})", file=sys.stderr)
    if path is not None and os.path.exists(path):
        try:
            from jax.experimental import serialize_executable as se
            t0 = time.time()
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            compiled = se.deserialize_and_load(payload, in_tree, out_tree)
            p["load_s"] = round(time.time() - t0, 1)
            p["aot"] = "hit"
            os.utime(path)  # refresh LRU access time (_evict_aot_cache)
            return compiled
        except Exception as e:
            print(f"# aot cache load failed ({e!r}); recompiling",
                  file=sys.stderr)
    t0 = time.time()
    compiled = lowered.compile()
    p["xla_s"] = round(time.time() - t0, 1)
    p["aot"] = "miss"
    if path is not None:
        try:
            from jax.experimental import serialize_executable as se
            payload, in_tree, out_tree = se.serialize(compiled)
            os.makedirs(_AOT_DIR, exist_ok=True)
            with open(path + ".tmp", "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(path + ".tmp", path)
            print(f"# aot cache saved {len(payload) / 1e6:.1f} MB "
                  f"({os.path.basename(path)})", file=sys.stderr)
            _evict_aot_cache()
        except Exception as e:
            print(f"# aot cache save failed ({e!r})", file=sys.stderr)
    return compiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", action="store_true",
                    help="also print per-stage accounting to stderr")
    ap.add_argument("--predator", action="store_true",
                    help="bench the Predator eval pipeline instead of FCGF")
    ap.add_argument("--group", type=int, default=4,
                    help="pairs per jit step (FCGF pipeline)")
    ap.add_argument("--fcgf_only", action="store_true",
                    help="skip the Predator pipeline in the default run")
    args = ap.parse_args()

    _evict_aot_cache()  # bound the cache even on hit-only runs

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

    # One-time backend/tunnel warmup, measured and attributed: the FIRST
    # program of a process pays 30-60+ s on this tunneled backend
    # REGARDLESS of size (round-5 probe: a 128x128 multiply cost 34.7-62.6 s
    # while the 149 MB eval executable's first-execute after it was ~9 s =
    # its steady-state run time; tools/probe_warm_start.py).  Paying it on
    # a trivial program here keeps every later phase attributable to OUR
    # programs — this was the round-4 "82.4 s warm start" mystery.
    t0 = time.time()
    float(jax.jit(lambda a: (a * 2.0 + 1.0).sum())(jnp.ones((128, 128))))
    warmup_s = round(time.time() - t0, 1)
    print(f"# backend warmup (tiny program): {warmup_s}s",
          file=sys.stderr, flush=True)

    if args.predator:
        _bench_predator(jax, jnp, emit_json=True)
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

    def one_group(params, bstats, key, pts0, mask0, pts1, mask1, t_gt):
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
        f0, f1, _ = trainer._encode_pair(params, bstats, batch, False)
        keys = jax.random.split(k_e, GROUP)
        return jax.vmap(
            tester._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(params, bstats, f0, f1,
          batch.xyz0, batch.xyz1,
          batch.pyramid0.levels[0].mask, batch.pyramid1.levels[0].mask,
          batch.t_gt, keys)

    # params/batch_stats enter as ARGUMENTS, not closure captures: captured
    # weights lower to HLO constants, bloating the program XLA must chew
    # through and making its fingerprint depend on random init values
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
    compiled = aot_compile(bench_scan, call1, "fcgf_eval", phases)
    acc, outs = compiled(*call1)
    # materialize, don't block_until_ready: the first call of an AOT
    # Compiled executable on this backend returns arrays whose ready-future
    # is a no-op (measured: block 0.000 s while the real first execution —
    # including the device upload of the ~190 MB executable — finished
    # 102 s later); a scalar device->host copy is the only honest barrier
    float(acc)
    compile_s = time.time() - t0
    ph = phases["fcgf_eval"]
    ph["first_run_s"] = round(
        compile_s - ph["trace_s"] - ph.get("xla_s", ph.get("load_s", 0.0)),
        1)
    print(f"# compiled+first run in {compile_s:.1f}s "
          f"(phases: {json.dumps(ph)})", file=sys.stderr, flush=True)

    call2 = (jax.random.PRNGKey(2), raw, state.params, state.batch_stats)
    t0 = time.time()
    acc, outs = compiled(*call2)
    float(acc)
    dt = time.time() - t0
    n_pairs = SCAN_ITERS * GROUP
    value = n_pairs / dt

    # utilization from XLA's own cost model of the whole compiled pipeline.
    # MFU is meaningless for this gather-bound program (~0.08%); the
    # defensible ceiling is the HBM roofline: bytes accessed / time vs the
    # v5e 819 GB/s HBM bandwidth (docs/PERF.md §10 measured the conv
    # gathers alone at ~25-30% of roofline; this is the whole-pipeline
    # analog from the compiler's access accounting)
    mfu = None
    hbm_util = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = flops / dt / V5E_PEAK_BF16
        nbytes = float(ca.get("bytes accessed", 0.0))
        if nbytes > 0:
            hbm_util = nbytes / dt / V5E_HBM_BYTES_PER_S
    except Exception:  # cost_analysis availability varies by backend
        pass

    record = {
        "metric": "pairs_per_sec",
        "value": round(value, 4),
        "unit": "pairs/s",
        "vs_baseline": round(value / TARGET_PAIRS_PER_SEC, 4),
        # time to first result, split by phase: trace_s = host tracing,
        # xla_s = backend compile RPC (load_s = AOT-cache load instead on a
        # hit), first_run_s = first execution.  The round-3 driver-observed
        # 1058.5 s was an un-split cold number on the tunneled backend; the
        # AOT executable cache (aot_compile docstring) now removes the
        # backend compile from the measured path entirely when warm.
        "compile_s": round(compile_s, 1),
        "backend_warmup_s": warmup_s,
        "compile_phases": phases,
    }
    if hbm_util is not None:
        record["hbm_roofline_util"] = round(hbm_util, 4)
    if mfu is not None:
        record["mfu"] = round(mfu, 6)
    print(
        f"# detail: {SCAN_ITERS} iterations x {GROUP}-pair groups in one "
        f"dispatch, {dt:.3f}s total ({dt / n_pairs * 1e3:.1f} ms/pair); "
        f"compile {compile_s:.1f}s"
        + (f"; HBM roofline util ~{hbm_util * 100:.0f}% (XLA bytes-"
           f"accessed / 819 GB/s — the relevant ceiling for this "
           f"gather-bound pipeline)" if hbm_util else "")
        + (f"; MFU ~{mfu * 100:.2f}% of v5e bf16 peak" if mfu else ""),
        file=sys.stderr,
    )

    if not args.fcgf_only:
        # the reference treats both stacks as first-class
        # (Predator_APR/lib/tester.py:33-141) — emit both in one line
        try:
            pred = _bench_predator(jax, jnp, emit_json=False, phases=phases)
            record.update(pred)
        except Exception as e:
            print(f"# predator bench failed: {e!r}", file=sys.stderr)
            record["predator_error"] = repr(e)
        try:
            record.update(_bench_bucket_tier(jax, jnp, cfg, trainer, state,
                                             phases))
        except Exception as e:
            print(f"# bucket-tier bench failed: {e!r}", file=sys.stderr)
            record["bucket_error"] = repr(e)

    print(json.dumps(record))

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
            return bench_scan(key, raw, state.params, state.batch_stats)[0]

        jax.block_until_ready(run_full(jax.random.PRNGKey(2), raw))
        total_ms = _min_of(run_full)
        print(f"# stage {'encoder alone':<24}{t_enc - t_prep:8.1f} ms/pair",
              file=sys.stderr)
        print(f"# stage {'match+RANSAC+errors':<24}{total_ms - t_enc:8.1f}"
              f" ms/pair (total {total_ms:.1f}, min-of-3 contemporaneous)",
              file=sys.stderr)


def _bench_bucket_tier(jax, jnp, cfg, trainer, state, phases,
                       group=4, iters=16):
    """Occupancy-bucketed eval tier (round-5, eval/bucketing.py): a
    KITTI-light pair (~7-8k occupied voxels of a 16384 worst-case budget)
    measured at the /2 tier capacities with the SAME weights — valid-voxel
    features are capacity-independent (tests/test_bucketing.py), so the
    tester selects this tier per pair at no recall cost.  The reference has
    no analog cost at all (shape-dynamic torch), so tier selection is pure
    margin for under-full clouds."""
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.eval import FeatureTester
    from apr_tpu.eval.bucketing import bucket_for_pair
    from apr_tpu.training.batching import make_pair_batch

    pair = synthetic_pair(seed=3, n_points=10000, apc_points=4, extent=60.0,
                          distance=20.0)
    pc, caps = bucket_for_pair(pair, cfg.voxel_size, cfg.capacities,
                               cfg.point_capacity, max_tiers=1)
    if caps[0] != cfg.capacities[0] // 2:
        print(f"# bucket tier: pair unexpectedly selected caps {caps}",
              file=sys.stderr)
    c = cfg.replace(point_capacity=pc, capacities=caps)
    tester = FeatureTester(c, trainer, state)
    p0, m0 = pad_points(pair["points0"], c.point_capacity)
    p1, m1 = pad_points(pair["points1"], c.point_capacity)
    raw = (jnp.asarray(p0), jnp.asarray(m0), jnp.asarray(p1),
           jnp.asarray(m1), jnp.asarray(pair["t_gt"]))

    def one_group(params, bstats, key, pts0, mask0, pts1, mask1, t_gt):
        k_j0, k_j1, k_e = jax.random.split(key, 3)
        p0 = pts0[None] + jax.random.normal(
            k_j0, (group,) + pts0.shape) * 1e-4
        p1 = pts1[None] + jax.random.normal(
            k_j1, (group,) + pts1.shape) * 1e-4
        m0 = jnp.broadcast_to(mask0[None], (group,) + mask0.shape)
        m1 = jnp.broadcast_to(mask1[None], (group,) + mask1.shape)
        tg = jnp.broadcast_to(t_gt[None], (group, 4, 4))
        zeros = jnp.zeros((group, 1, 3))
        zmask = jnp.zeros((group, 1), bool)
        batch = make_pair_batch(
            p0, m0, p1, m1, zeros, zmask, zeros, zmask, tg,
            voxel_size=c.voxel_size, capacities=c.capacities,
            conv1_kernel_size=c.conv1_kernel_size,
            corr_cap=c.corr_capacity_per_point,
            search_multiplier=c.positive_pair_search_voxel_size_multiplier,
            with_correspondences=False,
        )
        f0, f1, _ = trainer._encode_pair(params, bstats, batch, False)
        keys = jax.random.split(k_e, group)
        return jax.vmap(
            tester._eval_one, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0, 0)
        )(params, bstats, f0, f1, batch.xyz0, batch.xyz1,
          batch.pyramid0.levels[0].mask, batch.pyramid1.levels[0].mask,
          batch.t_gt, keys)

    def bench_scan(key, raw, params, bstats):
        pts0, mask0, pts1, mask1, t_gt = raw

        def body(carry, k):
            t_est, rte, rre, fit = one_group(
                params, bstats, k, pts0, mask0, pts1, mask1, t_gt)
            return carry + jnp.sum(rte), None

        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    call1 = (jax.random.PRNGKey(1), raw, state.params, state.batch_stats)
    t0 = time.time()
    compiled = aot_compile(bench_scan, call1, "fcgf_eval_b2", phases)
    float(compiled(*call1))
    compile_s = time.time() - t0
    ph = phases["fcgf_eval_b2"]
    ph["first_run_s"] = round(
        compile_s - ph["trace_s"] - ph.get("xla_s", ph.get("load_s", 0.0)), 1)
    t0 = time.time()
    float(compiled(jax.random.PRNGKey(2), raw, state.params,
                   state.batch_stats))
    dt = time.time() - t0
    n_pairs = iters * group
    print(f"# detail: bucket tier /2 (caps {caps[0]}, ~7-8k-voxel pairs): "
          f"{dt / n_pairs * 1e3:.1f} ms/pair = {n_pairs / dt:.2f} pairs/s; "
          f"compile {compile_s:.1f}s", file=sys.stderr)
    return {
        "bucket2_pairs_per_sec": round(n_pairs / dt, 4),
        "bucket2_ms_per_pair": round(dt / n_pairs * 1e3, 1),
        "bucket2_capacity": caps[0],
        "bucket2_compile_s": round(compile_s, 1),
    }


def _bench_predator(jax, jnp, emit_json=True, phases=None):
    """Predator eval pipeline throughput: KPFCNN forward +
    overlap*saliency Gumbel sampling + RANSAC, one pair per scan step
    (reference Predator_APR/lib/tester.py:33-141 protocol).

    Returns the metric dict; with emit_json it also prints its own JSON
    line (legacy ``--predator`` mode)."""
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

    def bench_scan(key, batch, params):
        def body(carry, k):
            kj, ke = jax.random.split(k)
            _, rte, _, _ = step(params, jitter_pyramids(batch, kj), ke)
            return carry + rte, None
        keys = jax.random.split(key, iters)
        acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
        return acc

    if phases is None:
        phases = {}
    call1 = (jax.random.PRNGKey(1), batch0, params)
    t0 = time.time()
    compiled = aot_compile(bench_scan, call1, "predator_eval", phases)
    acc = compiled(*call1)
    float(acc)  # materialize — see the fcgf path for why not block_until_ready
    compile_s = time.time() - t0
    ph = phases["predator_eval"]
    ph["first_run_s"] = round(
        compile_s - ph["trace_s"] - ph.get("xla_s", ph.get("load_s", 0.0)),
        1)
    t0 = time.time()
    acc = compiled(jax.random.PRNGKey(2), batch0, params)
    float(acc)
    dt = time.time() - t0
    value = iters / dt
    record = {
        "predator_pairs_per_sec": round(value, 4),
        "predator_vs_baseline": round(value / TARGET_PAIRS_PER_SEC, 4),
        "predator_compile_s": round(compile_s, 1),
    }
    if emit_json:
        print(json.dumps({
            "metric": "predator_pairs_per_sec",
            "value": record["predator_pairs_per_sec"],
            "unit": "pairs/s",
            "vs_baseline": record["predator_vs_baseline"],
            "compile_s": record["predator_compile_s"],
            "compile_phases": {"predator_eval": ph},
        }))
    print(f"# detail: {iters} predator-eval iterations in one dispatch, "
          f"{dt:.3f}s ({dt / iters * 1e3:.1f} ms/pair); compile "
          f"{compile_s:.1f}s", file=sys.stderr)

    if not emit_json:
        # default both-stacks run: skip the build-cost detail probe (it
        # costs a second full compile; run `bench.py --predator` for it)
        return record

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
    return record


if __name__ == "__main__":
    main()
