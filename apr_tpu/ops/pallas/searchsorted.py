"""Pallas merge-path searchsorted for sorted-per-row query batches.

The kernel-map builds (`models/sparse.py _zrun_maps`) and their relatives
spend their time in ``jnp.searchsorted(support, queries, method='sort')``,
which re-sorts support+queries together (O((S + GC) log(S + GC)) bitonic
work) even though BOTH sides are already sorted: the support keys are the
sorted level keys, and each query row is ``base_keys + delta`` — the same
sorted sequence shifted by a constant.  Merging two sorted sequences needs
only a linear pass; XLA has no merge primitive, but the structure maps
cleanly onto a Pallas tile kernel:

For each 128-query tile (tiles never straddle group rows):
  1. the tile's valid-query range [q_min, q_max] is bracketed in the
     support via a 128-entry COARSE table (support[::128], precomputed in
     XLA) — two tiny compare-reduces instead of full-support scans, at the
     price of <=128 extra elements on each side of the bracket;
  2. a slab loop counts, for every query, the supports below it inside
     successive W-wide windows starting at the bracket floor ``lo_a``
     (128-aligned by construction).  ``j0[i] = lo_a + count_i`` is EXACT
     for any data: elements below lo_a are all < q_min <= q[i], and the
     loop runs ceil(bracket_span / W) slabs so no support in
     [q_min, q_max] is missed.  Typical data needs ONE slab; adversarial
     spans just loop more — no approximate path, no fallback.
  3. INVALID queries (masked columns / out-of-field offsets) return
     ``s_valid`` — identical to XLA's searchsorted-left of INT32_MAX —
     without scanning the INVALID run.

Per-row sortedness of the VALID entries is required (invalid holes are
fine); ``searchsorted_left`` documents the contract and the call sites
guarantee it.  Measured on v5e at kernel-map shapes (S=16384, G=25,
C=16384): 5.2 ms (XLA sort-method) -> 1.76 ms (this kernel, tq=1024,
window=1664; scan protocol, exact match) — 3.0x.  The kernel is
per-program-overhead + VPU compare bound; tile-size sweep in docs/PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apr_tpu.ops.hashing import INVALID_KEY

_LANES = 128    # coarse-table stride / slab-base alignment
_NC = 128       # coarse table size (lanes); supports up to 16384 support


def _kernel(meta_ref, sup_ref, q_ref, out_ref, *, window: int, tq: int):
    q = q_ref[0, :]                                   # [TQ] int32
    valid = q < INVALID_KEY
    qmin = jnp.min(jnp.where(valid, q, INVALID_KEY))
    qmax = jnp.max(jnp.where(valid, q, jnp.iinfo(jnp.int32).min))

    coarse = meta_ref[0, :_NC]                        # support[::128] padded
    s_valid = meta_ref[0, _NC]
    c_lo = jnp.sum((coarse < qmin).astype(jnp.int32))
    c_hi = jnp.sum((coarse < qmax).astype(jnp.int32))
    # coarse[c_lo - 1] < qmin  =>  every support below (c_lo-1)*128 is
    # < qmin <= any valid query: counting from lo_a stays exact.
    lo_a = pl.multiple_of(jnp.maximum(c_lo - 1, 0) * _LANES, _LANES)
    # coarse[c_hi] >= qmax  =>  rank(qmax) <= c_hi * 128 (+ tail partial).
    hi_b = c_hi * _LANES + _LANES
    nslab = pl.cdiv(hi_b - lo_a, window)

    def body(sl, cnt):
        win = sup_ref[0, pl.ds(lo_a + sl * window, window)]
        return cnt + jnp.sum(
            (win[None, :] < q[:, None]).astype(jnp.int32), axis=1)

    cnt = jax.lax.fori_loop(0, nslab, body,
                            jnp.zeros((tq,), jnp.int32))
    out_ref[0, :] = jnp.where(valid, lo_a + cnt, s_valid)


@functools.partial(jax.jit, static_argnames=("window", "tq", "interpret"))
def searchsorted_left(support: jnp.ndarray, queries: jnp.ndarray,
                      window: int = 1664, tq: int = 1024,
                      interpret: bool = False):
    """Left insertion points of ``queries`` [G, C] in ``support`` [S].

    Contract: ``support`` ascending (INVALID_KEY padding allowed at the
    tail); within each query row the entries that are not INVALID_KEY form
    an ascending subsequence (INVALID holes anywhere are fine).  Returns
    int32 [G, C] equal to ``jnp.searchsorted(support, queries, 'left')``.

    S and C must be multiples of 128, S <= 16384 (the coarse table is one
    lane row); ``window`` a multiple of 128.
    """
    s = support.shape[0]
    g, c = queries.shape
    while c % tq != 0:  # largest per-program tile the row length allows
        tq //= 2
    assert s % _LANES == 0 and c % tq == 0 and window % _LANES == 0, (
        s, c, window)
    assert s <= _NC * _LANES, f"support {s} exceeds coarse-table reach"
    # pad so any slab [lo_a, lo_a + nslab*window) stays in bounds:
    # lo_a <= hi_b <= s + 128 and slabs end < hi_b + window
    sup_pad = jnp.concatenate(
        [support,
         jnp.full((window + 2 * _LANES,), INVALID_KEY, support.dtype)]
    )[None, :]
    coarse = jnp.full((_NC,), INVALID_KEY, support.dtype)
    coarse = coarse.at[: s // _LANES].set(support[::_LANES])
    s_valid = jnp.sum((support < INVALID_KEY).astype(jnp.int32))
    meta = jnp.concatenate(
        [coarse, s_valid[None],
         jnp.zeros((_LANES - 1,), jnp.int32)])[None, :]  # [1, 2*_NC]

    # flatten [G, C] -> [1, G*C]: Mosaic wants the sublane block equal to
    # the array dim; tiles never straddle group rows because C % 128 == 0
    flat = queries.reshape(1, g * c)
    kern = functools.partial(_kernel, window=window, tq=tq)
    out = pl.pallas_call(
        kern,
        grid=(g * c // tq,),
        in_specs=[
            pl.BlockSpec((1, 2 * _NC), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s + window + 2 * _LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, g * c), jnp.int32),
        interpret=interpret,
    )(meta, sup_pad, flat)
    return out.reshape(g, c)
