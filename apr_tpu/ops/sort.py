"""Bitonic sorting network as plain XLA vector ops.

Why this exists: the voxel pipeline is sort-bound (docs/PERF.md — the
pyramid's one argsort + voxelize's ``jnp.unique`` are the floor under the
batch build), and TPU ``lax.sort`` is a generic comparator sort whose cost
at our shapes is op-overhead-bound, not bandwidth-bound.  A bitonic network
is data-oblivious: log2(N)*(log2(N)+1)/2 compare-exchange stages of pure
``reshape / min / max / where`` that (a) vectorize across any leading batch
dims at no extra op count — the vmapped sorts of the 2B-folded batch build
ride one network — and (b) lower to TPU vector ops with no scatter/gather.

Keys must be int32 (or any dtype where ``<`` is the sort order, e.g.
non-negative packed voxel keys; INVALID_KEY = int32 max sorts to the tail)
and the sorted axis length a power of two — true for every capacity in the
pyramid (apr_tpu.config capacities).

Measured on v5e (tools/profile_sort.py) before wiring anything in; see
docs/PERF.md for the verdict.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def _stages(n: int):
    size = 2
    while size <= n:
        d = size // 2
        while d >= 1:
            yield size, d
            d //= 2
        size *= 2


def bitonic_sort(
    keys: jnp.ndarray, values: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Sort ``keys`` ascending along the LAST axis; optionally carry one
    payload array of identical shape through the same permutation.

    Returns (sorted_keys, permuted_values_or_None).  Not stable (equal keys
    may reorder) — fine for voxel keys where members of a voxel are reduced
    order-independently (segment_sum/min).
    """
    n = keys.shape[-1]
    assert n & (n - 1) == 0, f"bitonic length must be a power of 2, got {n}"
    lead = keys.shape[:-1]
    for size, d in _stages(n):
        rows = n // (2 * d)
        k2 = keys.reshape(*lead, rows, 2, d)
        a, b = k2[..., 0, :], k2[..., 1, :]
        # element index i = row*2d + s*d + t; direction tests bit ``size``
        # of i, which neither s*d (< 2d <= size) nor t (< d) can set
        base = jnp.arange(rows, dtype=jnp.int32) * (2 * d)
        asc = (base & size) == 0                      # [rows]
        swap = jnp.where(asc[:, None], a > b, a < b)  # [..., rows, d]
        keys = jnp.concatenate(
            [jnp.where(swap, b, a)[..., None, :],
             jnp.where(swap, a, b)[..., None, :]], axis=-2
        ).reshape(*lead, n)
        if values is not None:
            v2 = values.reshape(*lead, rows, 2, d)
            va, vb = v2[..., 0, :], v2[..., 1, :]
            values = jnp.concatenate(
                [jnp.where(swap, vb, va)[..., None, :],
                 jnp.where(swap, va, vb)[..., None, :]], axis=-2
            ).reshape(*lead, n)
    return keys, values


def bitonic_argsort(keys: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sorted_keys, order) such that ``keys[..., order] == sorted_keys``."""
    idx = jnp.broadcast_to(
        jnp.arange(keys.shape[-1], dtype=jnp.int32), keys.shape
    )
    s, o = bitonic_sort(keys, idx)
    return s, o
