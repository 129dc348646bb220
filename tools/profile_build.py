"""Stage breakdown of the FCGF device-side batch build (make_pair_batch).

The fused-vs-serial study (docs/PERF.md round 4) showed the build cannot be
hidden behind the step on one chip — a TPU core runs one op at a time, so
fused(step i, build i+1) == step + build.  The only lever left is making
the build itself cheaper; this tool attributes its cost.

Scan protocol (one jit dispatch, data-dependent iterations, scalar
readback) as everywhere else — see docs/PERF.md "measurement methodology".

    python tools/profile_build.py [--batch 4] [--k 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.config import APRConfig
    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.training.batching import make_pair_batch

    cfg = APRConfig(
        voxel_size=0.3,
        point_capacity=32768,
        capacities=(16384, 8192, 4096, 2048),
        apc_capacity=65536,
        conv1_kernel_size=5,
    )
    K = args.k

    cols = [[] for _ in range(9)]
    for s in range(args.batch):
        d = synthetic_pair(s, n_points=30000, apc_points=60000,
                           distance=15.0, extent=60.0)
        vals = [*pad_points(d["points0"], cfg.point_capacity),
                *pad_points(d["points1"], cfg.point_capacity),
                *pad_points(d["apc0"], cfg.apc_capacity),
                *pad_points(d["apc1"], cfg.apc_capacity), d["t_gt"]]
        for c, v in zip(cols, vals):
            c.append(v)
    (p0, m0, p1, m1, a0, am0, a1, am1, tg) = [
        jnp.asarray(np.stack(c)) for c in cols]

    def scan_time(fn, label):
        @jax.jit
        def run(p0_):
            def body(c, k):
                j = jax.random.normal(k, c.shape) * 1e-4
                out = fn(c + j)
                # reduce every output leaf to defeat DCE, fold back into
                # the carry so iterations chain
                s = sum(jnp.sum(jnp.asarray(l, jnp.float32))
                        for l in jax.tree_util.tree_leaves(out))
                return c + s * 1e-30, None
            keys = jax.random.split(jax.random.PRNGKey(0), K)
            out, _ = jax.lax.scan(body, p0_, keys)
            return jnp.sum(out)
        t0 = time.time()
        _ = np.asarray(run(p0))
        compile_s = time.time() - t0
        t0 = time.time()
        _ = np.asarray(run(p0))
        dt = (time.time() - t0) / K
        print(f"{label:<46}{dt * 1e3:9.1f} ms  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    common = dict(voxel_size=cfg.voxel_size,
                  capacities=cfg.capacities,
                  conv1_kernel_size=cfg.conv1_kernel_size,
                  corr_cap=cfg.corr_capacity_per_point,
                  search_multiplier=(
                      cfg.positive_pair_search_voxel_size_multiplier))

    scan_time(lambda p: make_pair_batch(
        p, m0, p1, m1, a0, am0, a1, am1, tg, **common), "full build")

    scan_time(lambda p: make_pair_batch(
        p, m0, p1, m1, a0, am0, a1, am1, tg,
        with_correspondences=False, **common), "build w/o GT correspondences")

    # pyramid only: voxelize + levels + kernel maps for both clouds
    from apr_tpu.models.sparse import build_pyramid
    from apr_tpu.ops.voxelize import voxelize

    def pyramids_only(p):
        def one(pts, m):
            g = voxelize(pts, cfg.voxel_size, cfg.capacities[0], m)
            return build_pyramid(g, cfg.capacities, cfg.conv1_kernel_size)
        return jax.vmap(one)(jnp.concatenate([p, p1], 0),
                             jnp.concatenate([m0, m1], 0))
    scan_time(pyramids_only, "pyramids+maps only (2B fold)")

    def voxelize_only(p):
        def one(pts, m):
            g = voxelize(pts, cfg.voxel_size, cfg.capacities[0], m)
            return (g.keys, g.mask, g.point_voxel)
        return jax.vmap(one)(jnp.concatenate([p, p1], 0),
                             jnp.concatenate([m0, m1], 0))
    scan_time(voxelize_only, "voxelize only (2B fold)")

    def apc_dedup_full(p):
        # the round-3 dedup: full voxelize (unique + inverse searchsorted +
        # counts/barycenter segment ops) + representative gather
        def one(apc, am):
            g = voxelize(apc, cfg.voxel_size, apc.shape[0], am)
            n = apc.shape[0]
            pts = jnp.where((g.rep < n)[:, None],
                            apc[jnp.minimum(g.rep, n - 1)], 0.0)
            return pts, g.mask
        return jax.vmap(one)(
            jnp.concatenate([a0 + p[:, :1, :] * 0, a1], 0),
            jnp.concatenate([am0, am1], 0))
    scan_time(apc_dedup_full, "APC dedup via full voxelize (r3 path)")

    def apc_dedup_lean(p):
        from apr_tpu.ops.voxelize import dedup_points

        def one(apc, am):
            return dedup_points(apc, cfg.voxel_size, am)
        return jax.vmap(one)(
            jnp.concatenate([a0 + p[:, :1, :] * 0, a1], 0),
            jnp.concatenate([am0, am1], 0))
    scan_time(apc_dedup_lean, "APC dedup via dedup_points (lean)")


if __name__ == "__main__":
    main()
