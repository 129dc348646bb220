"""Decompose the on-device batch/pyramid build cost (the eval+train
bottleneck surfaced by bench --stages).  Same scan-in-one-jit protocol as
tools/profile_train_step.py.

    python tools/profile_pyramid.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # no persistent compilation cache: axon cache hits hang (see bench.py)

    from apr_tpu.models.sparse import (
        SparseLevel, build_pyramid, downsample_level, kernel_map_same,
        kernel_map_same_fast,
    )
    from apr_tpu.ops.voxelize import voxelize

    B, N, C0 = 8, 32768, 16384
    caps = (16384, 8192, 4096, 2048)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-60, 60, (B, N, 3)).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    K = 8

    def sum_tree(t):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t))

    def bench(label, fn):
        @jax.jit
        def run(key):
            def body(c, k):
                jp = pts + jax.random.normal(k, ()) * 1e-6
                return c + fn(jp), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()),
                                  jax.random.split(key, K))
            return acc
        r = run(jax.random.PRNGKey(0)); _ = np.asarray(r)
        t0 = time.time()
        r = run(jax.random.PRNGKey(1)); _ = np.asarray(r)
        print(f"{label:<42}{(time.time() - t0) / K * 1e3:9.1f} ms "
              f"(8 clouds)", flush=True)

    vox = jax.vmap(lambda pp, mm: voxelize(pp, 0.3, C0, mm),
                   in_axes=(0, 0))

    bench("voxelize x8", lambda p: sum_tree(vox(p, mask)))

    # full pyramid (voxelize + levels + all maps)
    def full(p):
        g = vox(p, mask)

        def one(coords, keys, m):
            lv = type(g)(coords=coords, keys=keys, mask=m,
                         point_voxel=jnp.zeros((N,), jnp.int32),
                         counts=jnp.zeros((C0,), jnp.int32),
                         barycenter=jnp.zeros((C0, 3)),
                         rep=jnp.zeros((C0,), jnp.int32))
            return build_pyramid(lv, caps, 5)
        return sum_tree(jax.vmap(one)(g.coords, g.keys, g.mask))
    bench("voxelize + build_pyramid x8", full)

    # levels only (downsample chain)
    def levels_only(p):
        g = vox(p, mask)

        def one(coords, keys, m):
            lv = SparseLevel(coords=coords, keys=keys, mask=m)
            out = [lv]
            for cap in caps[1:]:
                out.append(downsample_level(out[-1], cap))
            return tuple(out)
        return sum_tree(jax.vmap(one)(g.coords, g.keys, g.mask))
    bench("voxelize + downsample levels x8", levels_only)

    # conv1 map only (125 offsets at level 0)
    def conv1_only(p):
        g = vox(p, mask)

        def one(coords, keys, m):
            lv = SparseLevel(coords=coords, keys=keys, mask=m)
            return kernel_map_same(lv, 5)
        return sum_tree(jax.vmap(one)(g.coords, g.keys, g.mask))
    bench("voxelize + conv1 map naive x8", conv1_only)

    def conv1_fast(p):
        g = vox(p, mask)

        def one(coords, keys, m):
            lv = SparseLevel(coords=coords, keys=keys, mask=m)
            return kernel_map_same_fast(lv, 5)
        return sum_tree(jax.vmap(one)(g.coords, g.keys, g.mask))
    bench("voxelize + conv1 map z-run x8", conv1_fast)

    # one 27-offset same map at level 0
    def same_only(p):
        g = vox(p, mask)

        def one(coords, keys, m):
            lv = SparseLevel(coords=coords, keys=keys, mask=m)
            return kernel_map_same(lv, 3)
        return sum_tree(jax.vmap(one)(g.coords, g.keys, g.mask))
    bench("voxelize + one 27-off same map x8", same_only)


if __name__ == "__main__":
    main()
