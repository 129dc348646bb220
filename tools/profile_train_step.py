"""Per-stage timing of the FCGF train step at full KITTI scale.

Feeds PERF.md's stage accounting: times the full train_step and ablations
(contrastive-only step / encoder forward / chamfer fwd+bwd standalone) so the
per-stage numbers reconcile with the total.

Methodology: on this TPU (reached through the axon tunnel) per-dispatch
timing is dominated by ~30-150 ms host<->device round trips, and
block_until_ready after several queued dispatches under-reports wildly.  So
every measurement here scans K iterations inside ONE jit with a data
dependency threaded through the carry (no stage can be hoisted or
overlapped with host latency), reads back one scalar, and divides by K —
the same protocol as bench.py.

    python tools/profile_train_step.py [--chamfer exact|pallas|window] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chamfer", default="window")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--ratio", type=int, default=4)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--only", default="",
                    help="comma list: step,nogen,fwd,fwd2x,chamfer,"
                         "sustained,fused.  Default runs all EXCEPT "
                         "sustained and fused — those two compile a second "
                         "full build+step program (~minutes) and are "
                         "opt-in only.")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    import jax
    import jax.numpy as jnp

    # no persistent compilation cache: axon cache hits hang (see bench.py)

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.training import get_trainer, make_pair_batch

    K = args.k

    def scan_time(make_body, init, label):
        """Time K data-dependent iterations inside one jit dispatch."""
        @jax.jit
        def run(init):
            def body(c, k):
                return make_body(c, k), None
            keys = jax.random.split(jax.random.PRNGKey(3), K)
            out, _ = jax.lax.scan(body, init, keys)
            return jax.tree.map(
                lambda l: jnp.sum(l) if l.dtype != bool else 0.0,
                jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        r = run(init)
        _ = np.asarray(r)
        compile_s = time.time() - t0
        t0 = time.time()
        r = run(init)
        _ = np.asarray(r)
        dt = (time.time() - t0) / K
        print(f"{label:<28}{dt * 1e3:9.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    cfg = APRConfig(
        trainer="GenerativePairTrainer",
        model="ResUNetFatBN",
        model_n_out=128,
        conv1_kernel_size=5,
        generator_model="GenerativeMLP_98",
        point_generation_ratio=args.ratio,
        batch_size=args.batch,
        voxel_size=0.3,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=65536,
        chamfer_mode=args.chamfer,
    )
    print(f"# chamfer_mode={cfg.chamfer_mode} batch={args.batch} "
          f"recon/cloud={cfg.capacities[0] * args.ratio} "
          f"apc={cfg.apc_capacity}", flush=True)

    def build(cfg):
        p0s, m0s, p1s, m1s = [], [], [], []
        a0s, am0s, a1s, am1s, ts = [], [], [], [], []
        for s in range(args.batch):
            d = synthetic_pair(s, n_points=30000, apc_points=60000,
                               distance=15.0, extent=60.0)
            p0, m0 = pad_points(d["points0"], cfg.point_capacity)
            p1, m1 = pad_points(d["points1"], cfg.point_capacity)
            a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
            a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
            p0s.append(p0); m0s.append(m0); p1s.append(p1); m1s.append(m1)
            a0s.append(a0); am0s.append(am0); a1s.append(a1); am1s.append(am1)
            ts.append(d["t_gt"])
        stack = lambda xs: jnp.asarray(np.stack(xs))
        return make_pair_batch(
            stack(p0s), stack(m0s), stack(p1s), stack(m1s),
            stack(a0s), stack(am0s), stack(a1s), stack(am1s), stack(ts),
            voxel_size=cfg.voxel_size, capacities=cfg.capacities,
            conv1_kernel_size=cfg.conv1_kernel_size,
            corr_cap=cfg.corr_capacity_per_point,
            search_multiplier=cfg.positive_pair_search_voxel_size_multiplier,
        )

    trainer = get_trainer(cfg)

    # raw padded arrays (kept for the sustained build+step measurement)
    _cols = [[] for _ in range(9)]
    for s_ in range(args.batch):
        d = synthetic_pair(s_, n_points=30000, apc_points=60000,
                           distance=15.0, extent=60.0)
        vals = [*pad_points(d["points0"], cfg.point_capacity),
                *pad_points(d["points1"], cfg.point_capacity),
                *pad_points(d["apc0"], cfg.apc_capacity),
                *pad_points(d["apc1"], cfg.apc_capacity), d["t_gt"]]
        for col, v in zip(_cols, vals):
            col.append(v)
    (batch_pts0, batch_m0, batch_pts1, batch_m1, batch_apc0, batch_am0,
     batch_apc1, batch_am1, batch_tg) = [
        jnp.asarray(np.stack(c)) for c in _cols]

    batch = build(cfg)
    jax.block_until_ready(batch.feats0)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)

    if only is None or "step" in only:
        scan_time(lambda st, k: trainer.train_step(st, batch, k)[0],
                  state, "full train_step")

    if only is not None and "sustained" in only:
        # production steady state on ONE chip: the on-device batch build
        # (voxelize + pyramids + GT correspondences) serializes with the
        # train step — this measures build+step per iteration
        def build_and_step(st, k):
            kj, ke = jax.random.split(k)
            j = jax.random.normal(kj, batch_pts0.shape) * 1e-4
            b = make_pair_batch(
                batch_pts0 + j, batch_m0, batch_pts1 + j, batch_m1,
                batch_apc0, batch_am0, batch_apc1, batch_am1, batch_tg,
                voxel_size=cfg.voxel_size, capacities=cfg.capacities,
                conv1_kernel_size=cfg.conv1_kernel_size,
                corr_cap=cfg.corr_capacity_per_point,
                search_multiplier=(
                    cfg.positive_pair_search_voxel_size_multiplier),
            )
            return trainer.train_step(st, b, ke)[0]
        scan_time(build_and_step, state, "sustained (batch build + step)")

    if only is not None and "fused" in only:
        # the fused-build program (train_step_fused): step on the CARRIED
        # batch + build of the next batch in one executable — the two
        # halves share no data, so this measures what the production loop
        # (training/loop.py, config.fused_build) pays per iteration
        def fused_body(carry, k):
            st, b = carry
            kj, ke = jax.random.split(k)
            j = jax.random.normal(kj, batch_pts0.shape) * 1e-4
            raw = (batch_pts0 + j, batch_m0, batch_pts1 + j, batch_m1,
                   batch_apc0, batch_am0, batch_apc1, batch_am1, batch_tg)
            st2, _, b2 = trainer.train_step_fused(st, b, raw, ke)
            return (st2, b2)
        scan_time(fused_body, (state, batch),
                  "fused (step i + build i+1, one program)")

    if only is None or "nogen" in only:
        cfg_c = APRConfig(**{**cfg.__dict__,
                             "trainer": "HardestContrastiveLossTrainer"})
        tr_c = get_trainer(cfg_c)
        st_c = tr_c.init_state(jax.random.PRNGKey(0), batch)
        scan_time(lambda st, k: tr_c.train_step(st, batch, k)[0],
                  st_c, "step w/o generative")

    if only is None or "fwd" in only:
        def fwd_body(c, k):
            b = batch._replace(feats0=batch.feats0 + c * 1e-9,
                               feats1=batch.feats1 + c * 1e-9)
            f, f2, _ = trainer._encode_pair(
                state.params, state.batch_stats, b, False)
            return jnp.mean(f) + jnp.mean(f2)
        scan_time(fwd_body, jnp.zeros(()), "encoder fwd (pair-folded)")

    if only is None or "fwd2x" in only:
        def fwd2_body(c, k):
            f = trainer._encode(
                state.params, state.batch_stats,
                batch.feats0 + c * 1e-9, batch.pyramid0, False)[0]
            f2 = trainer._encode(
                state.params, state.batch_stats,
                batch.feats1 + c * 1e-9, batch.pyramid1, False)[0]
            return jnp.mean(f) + jnp.mean(f2)
        scan_time(fwd2_body, jnp.zeros(()), "encoder fwd x2 (unfolded)")

    if only is None or "chamfer" in only:
        from apr_tpu.losses.generative import npr_reconstruction
        n0 = cfg.capacities[0]
        key = jax.random.PRNGKey(1)
        anc = jax.random.uniform(key, (args.batch, 2, n0, 3)) * 60.0
        msk = jnp.ones((args.batch, 2, n0), bool)
        apc = jnp.concatenate([batch.apc0[:, None], batch.apc1[:, None]], 1)
        apm = jnp.concatenate([batch.apc0_mask[:, None],
                               batch.apc1_mask[:, None]], 1)
        mo0 = jax.random.normal(key, (args.batch, 2, n0, 3 * args.ratio)) * 0.3

        def cham_loss(mo):
            def one(m, a, k, ab, am):
                return npr_reconstruction(
                    m, a, ab, k, am, voxel_size=cfg.voxel_size,
                    chamfer_mode=cfg.chamfer_mode,
                    chamfer_cell_size=(cfg.chamfer_cell_multiplier
                                       * cfg.voxel_size))[0]
            f = jax.vmap(jax.vmap(one))
            return jnp.sum(f(mo, anc, msk, apc, apm))

        def cham_body(mo, k):
            g = jax.grad(cham_loss)(mo)
            return mo + 1e-9 * g
        scan_time(cham_body, mo0,
                  f"chamfer fwd+bwd 8x [{cfg.chamfer_mode}]")


if __name__ == "__main__":
    main()
