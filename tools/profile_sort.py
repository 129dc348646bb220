"""Sort-floor study (verdict-r3 item 9): is XLA's ``lax.sort`` really the
floor under the voxel pipeline, or does a data-oblivious bitonic network
(apr_tpu/ops/sort.py) beat it at our shapes?

Shapes measured: the pyramid argsort ([N] keys + index payload, N = point
capacity) and the batched flavor ([2B, N] — the 2B pair-folded batch build
vmaps the per-cloud sort).  Keys are 30-bit packed voxel keys (int32).

Protocol: K data-dependent iterations inside ONE jit dispatch (the carry
feeds each iteration's input), scalar readback, divide by K — same as
bench.py; per-dispatch timing through the axon tunnel is garbage.

    python tools/profile_sort.py [--n 32768] [--batch 8] [--k 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from apr_tpu.ops.sort import bitonic_argsort, bitonic_sort

    K = args.k

    def scan_time(fn, x0, label):
        @jax.jit
        def run(x0):
            def body(c, k):
                # re-key the input from the previous result so no iteration
                # can be hoisted, while keeping the value distribution
                j = jax.random.randint(k, c.shape, 0, 1 << 30, jnp.int32)
                out = fn(jnp.bitwise_xor(c, j) & ((1 << 30) - 1))
                return out, None
            keys = jax.random.split(jax.random.PRNGKey(0), K)
            out, _ = jax.lax.scan(body, x0, keys)
            return jnp.sum(out)
        t0 = time.time()
        r = run(x0)
        _ = np.asarray(r)
        compile_s = time.time() - t0
        t0 = time.time()
        _ = np.asarray(run(x0))
        dt = (time.time() - t0) / K
        print(f"{label:<44}{dt * 1e6:10.0f} us  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.integers(0, 1 << 30, size=args.n).astype(np.int32))
    xb = jnp.asarray(
        rng.integers(0, 1 << 30, size=(args.batch, args.n)).astype(np.int32))

    iota1 = jnp.arange(args.n, dtype=jnp.int32)

    print(f"# n={args.n} batch={args.batch} k={K} "
          f"device={jax.devices()[0].device_kind}")

    # keys-only sort
    scan_time(lambda x: jnp.sort(x), x1, f"lax.sort keys [{args.n}]")
    scan_time(lambda x: bitonic_sort(x)[0], x1, f"bitonic keys [{args.n}]")

    # argsort (keys + payload) — what voxelize_pyramid pays
    scan_time(
        lambda x: jax.lax.sort_key_val(x, iota1)[0],
        x1, f"lax.sort_key_val [{args.n}]")
    scan_time(
        lambda x: bitonic_argsort(x)[0],
        x1, f"bitonic argsort [{args.n}]")

    # batched (the 2B-folded build: one vmapped sort per cloud)
    iotab = jnp.broadcast_to(iota1, (args.batch, args.n))
    scan_time(
        lambda x: jax.vmap(jax.lax.sort_key_val)(x, iotab)[0],
        xb, f"vmapped lax.sort_key_val [{args.batch},{args.n}]")
    scan_time(
        lambda x: bitonic_argsort(x)[0],
        xb, f"batched bitonic argsort [{args.batch},{args.n}]")


if __name__ == "__main__":
    main()
