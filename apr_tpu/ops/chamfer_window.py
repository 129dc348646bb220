"""Windowed nearest-neighbor distances: the fast Chamfer for the train step.

Brute-force Chamfer scores Nq x Ns pairs (~4.3G pairs/cloud at KITTI scale)
and runs at VPU speed-of-light ~17 ms per directed 65k x 65k pass — the
dominant cost of the generative train step (reference chamferdist usage,
FCGF_APR/lib/complement_trainer.py:446-448).  This module cuts the work
~16x *algorithmically* while keeping a TPU-friendly access pattern:

1. bucket points on a uniform grid (cell = ``cell_size``) and sort BOTH
   clouds ONCE by x-major packed cell key (apr_tpu.ops.hashing —
   lexicographic in (x, y, z), so an x-slab is one contiguous key range);
   the sorted views are shared by the two chamfer directions;
2. scan over tiles of sorted queries; each tile's nearest supports live in
   the contiguous key range covering x-cells [tile_min_x - 1, tile_max_x + 1]
   — ONE ``lax.dynamic_slice`` per tile, no per-query gathers;
3. brute-force the [tile, window] distances with per-coordinate difference
   planes (same layout as ops.chamfer) and a masked min/argmin.

Unlike a 27-cell bucketed lookup (searchsorted + 27 gathers PER QUERY —
which XLA-TPU scheduled pathologically inside the differentiated train step;
that mode was deleted in round 3), every memory access here is a contiguous
slice; the pattern embeds cleanly under vmap + grad (verified in the train
step on v5e).

Clamp semantics: queries whose nearest
found support is farther than ``2 * cell_size`` — or whose window holds no
candidate — contribute the clamped distance ``(2 * cell_size)^2`` with zero
gradient.  Choose cell_size generously (default 4 voxels) so this only
caps outliers.  Exactness otherwise requires the tile's support window to
fit ``window`` entries (overflow truncates the +x edge).  Parity with exact
Chamfer is covered by tests/test_chamfer_window.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from apr_tpu.ops.hashing import COORD_BITS, pack_coords

_SLAB_SHIFT = 2 * COORD_BITS
_OFFSET = (1 << COORD_BITS) // 2
_INVALID = jnp.iinfo(jnp.int32).max


class SortedCloud(NamedTuple):
    """A cloud sorted by x-major cell key; supports-side planes are padded
    by ``pad`` zeros so window slices never go out of bounds."""

    keys: jnp.ndarray    # [N] sorted cell keys (_INVALID for masked rows)
    x: jnp.ndarray       # [N + pad]
    y: jnp.ndarray
    z: jnp.ndarray
    order: jnp.ndarray   # [N] original index of each sorted row
    n: int


def sort_cloud(points: jnp.ndarray, mask: Optional[jnp.ndarray],
               cell_size: float, pad: int) -> SortedCloud:
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    key = pack_coords(jnp.floor(points / cell_size).astype(jnp.int32))
    key = jnp.where(mask, key, _INVALID)
    order = jnp.argsort(key).astype(jnp.int32)
    zeros = jnp.zeros((pad,), points.dtype)
    return SortedCloud(
        keys=key[order],
        x=jnp.concatenate([points[order, 0], zeros]),
        y=jnp.concatenate([points[order, 1], zeros]),
        z=jnp.concatenate([points[order, 2], zeros]),
        order=order,
        n=n,
    )


def _slab_key(cx):
    return jnp.clip(cx + _OFFSET, 0, (1 << COORD_BITS) - 1) << _SLAB_SHIFT


def _directed_window(q: SortedCloud, s: SortedCloud, cell_size: float,
                     tile: int, window: int):
    """Per-sorted-query (d2, original support idx, resolved) and the masked
    mean over valid queries.  Returns values in ORIGINAL query order."""
    nq, ns = q.n, s.n
    fallback = jnp.asarray((2.0 * cell_size) ** 2, q.x.dtype)
    qvalid = q.keys != _INVALID
    qcx = (q.keys >> _SLAB_SHIFT) - _OFFSET  # x cell of each sorted query

    nq_p = -(-nq // tile) * tile
    def pad_to(v, fill):
        return jnp.pad(v[:nq], (0, nq_p - nq), constant_values=fill)
    qx_t = pad_to(q.x, 0.0).reshape(-1, tile)
    qy_t = pad_to(q.y, 0.0).reshape(-1, tile)
    qz_t = pad_to(q.z, 0.0).reshape(-1, tile)
    qv_t = pad_to(qvalid, False).reshape(-1, tile)
    big = _INVALID // 2
    qcx_t = pad_to(jnp.where(qvalid, qcx, big), big).reshape(-1, tile)
    cx_lo = jnp.min(jnp.where(qv_t, qcx_t, big), axis=1)
    cx_hi = jnp.max(jnp.where(qv_t, qcx_t, -big), axis=1)

    # masked supports carry _INVALID keys (sorted to the tail), so hi
    # excludes them: _slab_key(...) <= (1 << 30) - 1 < _INVALID
    lo = jnp.searchsorted(s.keys, _slab_key(cx_lo - 1)).astype(jnp.int32)
    hi = jnp.searchsorted(s.keys, _slab_key(cx_hi + 2)).astype(jnp.int32)

    offs = jnp.arange(window, dtype=jnp.int32)

    def body(_, inp):
        tqx, tqy, tqz, tlo, thi = inp
        wx = jax.lax.dynamic_slice(s.x, (tlo,), (window,))
        wy = jax.lax.dynamic_slice(s.y, (tlo,), (window,))
        wz = jax.lax.dynamic_slice(s.z, (tlo,), (window,))
        wvalid = tlo + offs < thi
        dx = tqx[:, None] - wx[None, :]
        dy = tqy[:, None] - wy[None, :]
        dz = tqz[:, None] - wz[None, :]
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(wvalid[None, :], d2, jnp.inf)
        best = jnp.min(d2, axis=1)
        arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        # clamp semantics: no candidate in the window OR
        # nearest farther than 2*cell -> fallback, zero gradient
        unresolved = ~(best < fallback)
        best = jnp.where(unresolved, fallback, best)
        sorted_idx = jnp.where(unresolved, ns, jnp.minimum(tlo + arg, ns))
        return None, (best, sorted_idx)

    _, (d2_t, sidx_t) = jax.lax.scan(
        body, None, (qx_t, qy_t, qz_t, lo, hi)
    )
    d2_sorted = d2_t.reshape(-1)[:nq]
    sidx_sorted = sidx_t.reshape(-1)[:nq]
    s_order_pad = jnp.concatenate([s.order, jnp.full((1,), ns, jnp.int32)])
    idx_sorted = s_order_pad[jnp.minimum(sidx_sorted, ns)]

    w = qvalid.astype(d2_sorted.dtype)
    nvalid = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(jnp.where(qvalid, d2_sorted, 0.0)) / nvalid

    # unsort to original query order for the backward gather
    out_idx = jnp.full((nq,), ns, jnp.int32).at[q.order].set(
        jnp.where(qvalid, idx_sorted, ns))
    return mean, out_idx, nvalid


@partial(jax.jit, static_argnames=("tile", "window"))
def windowed_nn_distances(
    queries: jnp.ndarray,            # [Nq, 3]
    supports: jnp.ndarray,           # [Ns, 3]
    q_mask: Optional[jnp.ndarray] = None,
    s_mask: Optional[jnp.ndarray] = None,
    cell_size: float = 1.2,
    tile: int = 1024,
    window: int = 4096,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sqdist [Nq], idx [Nq]) of the (near-)nearest support per query.

    idx == Ns and sqdist == (2 * cell_size)^2 for unresolved queries
    (including every masked query).
    """
    nq, ns = queries.shape[0], supports.shape[0]
    if q_mask is None:
        q_mask = jnp.ones((nq,), bool)
    q = sort_cloud(queries, q_mask, cell_size, pad=0)
    s = sort_cloud(supports, s_mask, cell_size, pad=window)
    _, idx, _ = _directed_window(q, s, cell_size, tile, window)
    fallback = jnp.asarray((2.0 * cell_size) ** 2, queries.dtype)
    safe = jnp.clip(idx, 0, ns - 1)
    d2 = jnp.sum((queries - supports[safe]) ** 2, axis=-1)
    d2 = jnp.where((idx < ns) & q_mask, d2, fallback)
    return d2, idx


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def chamfer_distance_window_stats(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_mask: Optional[jnp.ndarray] = None,
    b_mask: Optional[jnp.ndarray] = None,
    cell_size: float = 1.2,
    tile: int = 1024,
    window: int = 4096,
):
    """(chamfer, clamp_fraction): bidirectional windowed Chamfer plus the
    fraction of valid queries (both directions pooled) that hit the
    ``(2*cell_size)^2`` clamp — the loss-bias telemetry for sparse regions
    (distant LiDAR rings).  The fraction carries zero gradient.

    Each cloud is key-sorted ONCE; the sorted views serve as queries in one
    direction and supports in the other.
    """
    (val, frac), _ = _chamfer_window_fwd(a, b, a_mask, b_mask, cell_size,
                                         tile, window)
    return val, frac


def chamfer_distance_window(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_mask: Optional[jnp.ndarray] = None,
    b_mask: Optional[jnp.ndarray] = None,
    cell_size: float = 1.2,
    tile: int = 1024,
    window: int = 4096,
) -> jnp.ndarray:
    """Bidirectional windowed Chamfer (reference normalization)."""
    val, _ = chamfer_distance_window_stats(a, b, a_mask, b_mask, cell_size,
                                           tile, window)
    return val


def _chamfer_window_fwd(a, b, a_mask, b_mask, cell_size, tile, window):
    na, nb = a.shape[0], b.shape[0]
    if a_mask is None:
        a_mask = jnp.ones((na,), bool)
    if b_mask is None:
        b_mask = jnp.ones((nb,), bool)
    sa = sort_cloud(a, a_mask, cell_size, pad=window)
    sb = sort_cloud(b, b_mask, cell_size, pad=window)
    mean_ab, idx_ab, n_a = _directed_window(sa, sb, cell_size, tile, window)
    mean_ba, idx_ba, n_b = _directed_window(sb, sa, cell_size, tile, window)
    val = mean_ab + mean_ba
    # clamp-hit telemetry: unresolved valid queries carry idx == N_support
    clamped = (jnp.sum(jnp.where(a_mask, (idx_ab >= nb).astype(jnp.float32),
                                 0.0))
               + jnp.sum(jnp.where(b_mask, (idx_ba >= na).astype(jnp.float32),
                                   0.0)))
    frac = clamped / jnp.maximum(n_a + n_b, 1.0)
    return (val, frac), (a, b, idx_ab, idx_ba, n_a, n_b)


def _chamfer_window_bwd(cell_size, tile, window, res, g):
    # per-coordinate 1-D gathers/scatters: [N, 3] row gathers pad the 3-lane
    # trailing axis to the 128-lane tile on TPU (~42x wasted work)
    g, _ = g  # cotangent for (val, frac); frac is non-differentiable
    a, b, idx_ab, idx_ba, n_a, n_b = res
    na, nb = a.shape[0], b.shape[0]

    res_ab = idx_ab < nb
    safe_ab = jnp.clip(idx_ab, 0, nb - 1)
    res_ba = idx_ba < na
    safe_ba = jnp.clip(idx_ba, 0, na - 1)

    da_c, db_c = [], []
    for c in range(3):
        ac, bc = a[:, c], b[:, c]
        # a->b: d mean_ab / da_i = 2 (a_i - b_nn) / n_a  (resolved only)
        diff_ab = jnp.where(res_ab, ac - bc[safe_ab], 0.0)
        da = 2.0 * g / n_a * diff_ab
        db = jnp.zeros_like(bc).at[safe_ab].add(-da)
        # b->a
        diff_ba = jnp.where(res_ba, bc - ac[safe_ba], 0.0)
        db_q = 2.0 * g / n_b * diff_ba
        db = db + db_q
        da = da + jnp.zeros_like(ac).at[safe_ba].add(-db_q)
        da_c.append(da)
        db_c.append(db)
    return jnp.stack(da_c, -1), jnp.stack(db_c, -1), None, None


chamfer_distance_window_stats.defvjp(_chamfer_window_fwd, _chamfer_window_bwd)
