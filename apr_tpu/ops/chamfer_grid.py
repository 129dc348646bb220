"""Grid-bucketed nearest-neighbor distances: the fast Chamfer path.

Brute-force Chamfer scores Nq x Ns pairs (~4G pairs/cloud at KITTI scale,
VPU-bound at ~2s/step).  LiDAR reconstruction targets are spatially local:
the true NN is almost always within one cell of the query.  So: bucket the
supports on a uniform grid (cell = ``cell_size``), sort by packed cell key,
and for each query gather candidates only from its 27 neighboring cells via
searchsorted ranges — ~27 * cap candidates instead of Ns.  ~50-100x less
work, all static shapes.

Exactness: if the nearest support lies within ``cell_size`` of the query and
its cell holds <= ``bucket_cap`` supports, the result is exact.  Queries
whose 27-cell neighborhood has no candidate fall back to a clamped distance
``(2 * cell_size)^2`` — for the Chamfer *loss* this caps the contribution of
stray reconstruction points (the reference's exact chamfer would pull them
toward a far NN; the clamp simply caps that gradient's magnitude at zero —
choose cell_size generously (>= 4 voxels) so this is rare).  Callers needing
exact semantics use apr_tpu.ops.chamfer.

The grid structure (sort + searchsorted) is the TPU analog of the voxel hash
the reference builds on CPU (grid_subsampling.cpp) — see ops/hashing.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from apr_tpu.ops.hashing import INVALID_KEY, pack_coords

_NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def sort_supports_by_cell(supports, s_mask, cell_size):
    """Pre-sort supports by packed cell key (run OUTSIDE the training step;
    the APC is constant per batch).  Returns (sorted_pts, sorted_mask)."""
    s_cells = jnp.floor(supports / cell_size).astype(jnp.int32)
    s_keys = jnp.where(s_mask, pack_coords(s_cells), INVALID_KEY)
    order = jnp.argsort(s_keys).astype(jnp.int32)
    return supports[order], s_mask[order]


@partial(jax.jit, static_argnames=("bucket_cap", "assume_sorted"))
def grid_nn_distances(
    queries: jnp.ndarray,           # [Nq, 3]
    supports: jnp.ndarray,          # [Ns, 3]
    q_mask: Optional[jnp.ndarray] = None,
    s_mask: Optional[jnp.ndarray] = None,
    cell_size: float = 1.2,
    bucket_cap: int = 16,
    assume_sorted: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sqdist [Nq], idx [Nq]) of the (near-)nearest support per query.

    idx == Ns and sqdist == (2 * cell_size)^2 for unresolved queries.
    ``assume_sorted``: supports already ordered by packed cell key (see
    :func:`sort_supports_by_cell`) — skips the in-graph sort.
    """
    nq, ns = queries.shape[0], supports.shape[0]
    if q_mask is None:
        q_mask = jnp.ones((nq,), bool)
    if s_mask is None:
        s_mask = jnp.ones((ns,), bool)

    s_cells = jnp.floor(supports / cell_size).astype(jnp.int32)
    s_keys = jnp.where(s_mask, pack_coords(s_cells), INVALID_KEY)
    if assume_sorted:
        order = jnp.arange(ns, dtype=jnp.int32)
        sorted_keys = s_keys
        sorted_x = supports[:, 0]
        sorted_y = supports[:, 1]
        sorted_z = supports[:, 2]
        sorted_valid = s_mask
    else:
        order = jnp.argsort(s_keys).astype(jnp.int32)
        sorted_keys = s_keys[order]
        # per-coordinate 1-D buffers: gathering [N, 3] rows pads the 3-lane
        # dim 42x on TPU (T(8,128) tiling); [Nq, cap] planes don't
        sorted_x = supports[order, 0]
        sorted_y = supports[order, 1]
        sorted_z = supports[order, 2]
        sorted_valid = s_mask[order]

    q_cells = jnp.floor(queries / cell_size).astype(jnp.int32)
    qx, qy, qz = queries[:, 0], queries[:, 1], queries[:, 2]

    fallback = jnp.asarray((2.0 * cell_size) ** 2, queries.dtype)
    offsets = jnp.asarray(_NEIGHBOR_OFFSETS, jnp.int32)  # [27, 3]
    cap_range = jnp.arange(bucket_cap, dtype=jnp.int32)

    def body(carry, off):
        best_d2, best_i = carry
        key = pack_coords(q_cells + off[None, :])
        start = jnp.searchsorted(sorted_keys, key).astype(jnp.int32)
        take = start[:, None] + cap_range[None, :]          # [Nq, cap]
        take_c = jnp.minimum(take, ns - 1)
        in_cell = (sorted_keys[take_c] == key[:, None]) & (take < ns)
        in_cell = in_cell & sorted_valid[take_c]
        dx = sorted_x[take_c] - qx[:, None]
        dy = sorted_y[take_c] - qy[:, None]
        dz = sorted_z[take_c] - qz[:, None]
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(in_cell, d2, jnp.inf)
        cell_min = jnp.min(d2, axis=1)
        cell_arg = jnp.argmin(d2, axis=1).astype(jnp.int32)
        better = cell_min < best_d2
        best_d2 = jnp.where(better, cell_min, best_d2)
        chosen = order[take_c[jnp.arange(nq), cell_arg]]
        best_i = jnp.where(better, chosen, best_i).astype(jnp.int32)
        return (best_d2, best_i), None

    init = (jnp.full((nq,), fallback, queries.dtype),
            jnp.full((nq,), ns, jnp.int32))
    (best_d2, best_i), _ = jax.lax.scan(body, init, offsets)

    best_d2 = jnp.where(q_mask, best_d2, fallback)
    best_i = jnp.where(q_mask, best_i, ns)
    return best_d2, best_i


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _directed_mean_sq_nn_grid(queries, supports, q_mask, s_mask, cell_size,
                              bucket_cap, assume_sorted=False):
    d2, _ = grid_nn_distances(
        queries, supports, q_mask, s_mask,
        cell_size=cell_size, bucket_cap=bucket_cap,
        assume_sorted=assume_sorted,
    )
    w = q_mask.astype(queries.dtype)
    return jnp.sum(jnp.where(q_mask, d2, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


def _grid_fwd(queries, supports, q_mask, s_mask, cell_size, bucket_cap,
              assume_sorted=False):
    d2, idx = grid_nn_distances(
        queries, supports, q_mask, s_mask,
        cell_size=cell_size, bucket_cap=bucket_cap,
        assume_sorted=assume_sorted,
    )
    w = q_mask.astype(queries.dtype)
    nq = jnp.maximum(jnp.sum(w), 1.0)
    val = jnp.sum(jnp.where(q_mask, d2, 0.0)) / nq
    return val, (queries, supports, q_mask, idx, nq)


def _grid_bwd(cell_size, bucket_cap, assume_sorted, res, g):
    queries, supports, q_mask, idx, nq = res
    ns = supports.shape[0]
    resolved = (idx < ns) & q_mask  # unresolved rows carry zero gradient
    safe = jnp.clip(idx, 0, ns - 1)
    # per-coordinate 1-D gathers/scatters: [N, 3] row ops pad the 3-lane
    # trailing axis to the 128-lane TPU tile (~42x wasted work)
    dq_c, ds_c = [], []
    for c in range(queries.shape[1]):
        diff = jnp.where(resolved, queries[:, c] - supports[safe, c], 0.0)
        dq = 2.0 * g / nq * diff
        dq_c.append(dq)
        ds_c.append(jnp.zeros_like(supports[:, c]).at[safe].add(-dq))
    return jnp.stack(dq_c, -1), jnp.stack(ds_c, -1), None, None


_directed_mean_sq_nn_grid.defvjp(_grid_fwd, _grid_bwd)


def chamfer_distance_grid(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_mask: Optional[jnp.ndarray] = None,
    b_mask: Optional[jnp.ndarray] = None,
    cell_size: float = 1.2,
    bucket_cap: int = 16,
    b_sorted: bool = False,
) -> jnp.ndarray:
    """Bidirectional grid-accelerated Chamfer (reference normalization).

    ``b_sorted``: b is already cell-key-sorted (sort_supports_by_cell) so the
    a->b direction skips its in-graph sort (the b->a direction still sorts a).
    """
    if a_mask is None:
        a_mask = jnp.ones((a.shape[0],), bool)
    if b_mask is None:
        b_mask = jnp.ones((b.shape[0],), bool)
    return _directed_mean_sq_nn_grid(
        a, b, a_mask, b_mask, cell_size, bucket_cap, b_sorted
    ) + _directed_mean_sq_nn_grid(b, a, b_mask, a_mask, cell_size, bucket_cap,
                                  False)
