"""Window top-k selector study for the KP radius tables (round-5).

Round-4 left the Predator build's windowed radius tables dominated by
``lax.top_k`` over the [tile, window] distance planes (66 ms of the ~102 ms
build at 16k x 16k, docs/PERF.md) with two negative results (Pallas
gathers, approx_min_k).  This probe measures the exact selector variants in
ops/neighbors.py ``_SELECTORS`` IN CONTEXT — the full ``build_kp_pyramid``
at flagship shape, K jittered iterations inside one lax.scan per the
measurement methodology (per-dispatch timing is garbage on the tunneled
backend).

    python tools/probe_radius_select.py [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--methods", default="topk,tournament,itermin")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.data.synthetic import pad_points, synthetic_pair
    from apr_tpu.models.kpconv import build_kp_pyramid

    caps = (16384, 4096, 2048, 1024)
    limits = (40, 40, 40, 40)
    pair = synthetic_pair(seed=0, n_points=30000, apc_points=4,
                          extent=60.0, distance=15.0)
    p0, m0 = pad_points(pair["points0"], 32768)
    pts = jnp.asarray(p0)
    msk = jnp.asarray(m0)

    def tree_sum(t):
        return sum((jnp.sum(a.astype(jnp.float32))
                    for a in jax.tree.leaves(t)), jnp.zeros(()))

    results = {}
    for method in args.methods.split(","):
        def scan(key, pts, msk, method=method):
            def body(c, k):
                j = pts + jax.random.normal(k, pts.shape) * 1e-4
                pyr = build_kp_pyramid(
                    j, msk, 0.3, 4.25, len(caps), caps, limits, method)
                return c + tree_sum(pyr), None

            keys = jax.random.split(key, args.iters)
            acc, _ = jax.lax.scan(body, jnp.zeros(()), keys)
            return acc

        run = jax.jit(scan, static_argnames=())
        # materialize a SCALAR, never block_until_ready: on this tunneled
        # backend block_until_ready does not block after queued async
        # dispatches (docs/PERF.md measurement methodology)
        float(run(jax.random.PRNGKey(1), pts, msk))
        best = float("inf")
        for t in range(3):
            t0 = time.time()
            float(run(jax.random.PRNGKey(2 + t), pts, msk))
            best = min(best, time.time() - t0)
        ms = best / args.iters * 1e3
        results[method] = ms
        print(f"# build_kp_pyramid [{method:<10}] {ms:8.1f} ms/build "
              f"(min of 3, {args.iters}-iter scan)", flush=True)

    # exactness cross-check on the real shapes (selection sets must agree)
    from apr_tpu.training.predator import make_kp_pair_batch
    base = None
    for method in args.methods.split(","):
        pyr = build_kp_pyramid(pts, msk, 0.3, 4.25, len(caps), caps,
                               limits, method)
        nb = np.sort(np.asarray(pyr.levels[0].neighbors), axis=1)
        if base is None:
            base = nb
        else:
            frac = float((nb == base).mean())
            print(f"# exactness vs topk [{method}]: {frac * 100:.3f}% "
                  f"entries equal (ties may reorder)", flush=True)
    print({"results_ms": results})


if __name__ == "__main__":
    main()
