"""Predator sustained train cost (device-side batch build + train step) at
flagship KITTI shape — the KP-side companion of
`tools/profile_train_step.py --only sustained`.

Scan-in-one-jit protocol (docs/PERF.md measurement methodology).

    python tools/profile_predator_sustained.py [--k 8] [--apc 131072]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--apc", type=int, default=131072,
                    help="APC capacity (configs/train/kitti.yaml:75)")
    ap.add_argument("--symmetric", action="store_true",
                    help="KPFCNNDecoder symmetric generator at flagship "
                         "shape — the config the reference declares "
                         "unsupported for memory reasons "
                         "(Predator_APR/README.md:55)")
    ap.add_argument("--radius_select", default="topk",
                    help="window top-k strategy (ops/neighbors.py "
                         "_SELECTORS) for the radius tables")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.training.predator import PredatorTrainer, make_kp_pair_batch

    cfg = APRConfig(
        trainer="PredatorTrainer",
        point_capacity=32768,
        kp_capacities=(16384, 4096, 2048, 1024),
        neighborhood_limits=(40, 40, 40, 40),
        apc_capacity=args.apc,
        symmetric=args.symmetric,
        kp_radius_select=args.radius_select,
    )
    if args.symmetric:
        print("# symmetric KPFCNNDecoder generator at flagship shape",
              flush=True)
    trainer = PredatorTrainer(cfg)
    d = synthetic_pair(0, n_points=args.points, apc_points=args.apc // 2,
                       distance=15.0, extent=60.0)
    p0, m0 = pad_points(d["points0"], cfg.point_capacity)
    p1, m1 = pad_points(d["points1"], cfg.point_capacity)
    a0, am0 = pad_points(d["apc0"], cfg.apc_capacity)
    a1, am1 = pad_points(d["apc1"], cfg.apc_capacity)
    raw = tuple(jnp.asarray(v) for v in
                (p0, m0, p1, m1, a0, am0, a1, am1,
                 d["t_gt"].astype(np.float32)))

    def build(r):
        return make_kp_pair_batch(
            *r,
            first_subsampling_dl=cfg.first_subsampling_dl,
            conv_radius=cfg.conv_radius,
            capacities=cfg.kp_capacities,
            neighbor_limits=cfg.neighborhood_limits,
            overlap_radius=cfg.overlap_radius,
            radius_select=cfg.kp_radius_select,
        )

    batch = build(raw)
    jax.block_until_ready(batch.t_gt)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    K = args.k

    def scan_time(make_body, init, label):
        @jax.jit
        def run(init):
            def body(c, k):
                return make_body(c, k), None
            keys = jax.random.split(jax.random.PRNGKey(3), K)
            out, _ = jax.lax.scan(body, init, keys)
            return jnp.sum(jax.tree_util.tree_leaves(out)[0])
        t0 = time.time()
        _ = np.asarray(run(init))
        compile_s = time.time() - t0
        t0 = time.time()
        _ = np.asarray(run(init))
        dt = (time.time() - t0) / K
        print(f"{label:<40}{dt * 1e3:9.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    ws = jnp.asarray(0.0)

    scan_time(lambda st, k: trainer.train_step(st, batch, k, ws)[0],
              state, "train step (batch prebuilt)")

    def build_and_step(st, k):
        kj, ke = jax.random.split(k)
        j = jax.random.normal(kj, raw[0].shape) * 1e-4
        r = (raw[0] + j, raw[1], raw[2] + j, raw[3],
             raw[4], raw[5], raw[6], raw[7], raw[8])
        return trainer.train_step(st, build(r), ke, ws)[0]
    scan_time(build_and_step, state, "sustained (build + step)")


if __name__ == "__main__":
    main()
