"""Chamfer distance as a tiled online min-reduction (never materializes NxM).

Replaces the chamferdist CUDA extension used by both reference trainers
(FCGF_APR/lib/complement_trainer.py:188-196; Predator_APR/lib/trainer.py:
131-140).  Reduction contract matches the reference exactly:

    chamfer(a, b) = mean_i min_j ||a_i - b_j||^2 + mean_j min_i ||a_i - b_j||^2

(chamferdist returns per-point *sums* of squared NN distances; the reference
divides each direction by its own point count.)

The one-directional pass keeps only a running (min, argmin) per query while
scanning support blocks — the flash-attention-style memory shape for pairwise
reductions (SURVEY.md §5.7).  Gradients flow through a custom VJP that
re-gathers the argmin support point instead of saving the distance tiles.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pad_rows(x: jnp.ndarray, m: int, fill: float = 0.0) -> jnp.ndarray:
    n = x.shape[0]
    p = (n + m - 1) // m * m
    if p == n:
        return x
    pad = [(0, p - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@partial(jax.jit, static_argnames=("block",))
def nn_distances(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    s_mask: Optional[jnp.ndarray] = None,
    block: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query squared distance and index of the nearest support.

    Returns (sqdist float32 [Nq], idx int32 [Nq]).  Memory is O(Nq * block):
    support points stream through in blocks with a running min/argmin.

    Low-dim layout: distances accumulate from per-coordinate [Nq, block]
    difference planes.  A [Nq, block, dim] diff tensor would pad the dim-3
    trailing axis to the 128-lane tile (~42x wasted VPU work — measured 82x
    end-to-end at 65k x 65k on v5e); per-coordinate planes keep every lane
    busy and run within ~2x of the VPU speed-of-light for this op.
    """
    ns, dim = supports.shape
    if s_mask is None:
        s_mask = jnp.ones((ns,), dtype=bool)

    sp = _pad_rows(supports, block)
    sm = _pad_rows(s_mask[:, None], block).squeeze(-1)
    nblk = sp.shape[0] // block

    qq = jnp.sum(queries * queries, axis=-1)

    def body(carry, blk):
        best_d2, best_i = carry
        s_planes, m, base = blk  # s_planes: [dim, block]
        if dim <= 4:
            # exact per-coordinate differences: no cancellation at LiDAR
            # coordinate magnitudes (the matmul expansion cancels
            # catastrophically — see neighbors._pairwise_sqdist)
            d2 = jnp.zeros((queries.shape[0], block), queries.dtype)
            for c in range(dim):
                dc = queries[:, c:c + 1] - s_planes[c][None, :]
                d2 = d2 + dc * dc
        else:
            s = s_planes.T
            d2 = (
                qq[:, None]
                - 2.0 * jnp.dot(queries, s.T, precision=jax.lax.Precision.HIGHEST)
                + jnp.sum(s * s, axis=-1)[None, :]
            )
            d2 = jnp.maximum(d2, 0.0)
        d2 = jnp.where(m[None, :], d2, jnp.inf)
        blk_best = jnp.min(d2, axis=1)
        blk_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + base
        take = blk_best < best_d2
        return (
            jnp.where(take, blk_best, best_d2),
            jnp.where(take, blk_arg, best_i),
        ), None

    init = (jnp.full((queries.shape[0],), jnp.inf, dtype=queries.dtype),
            jnp.full((queries.shape[0],), ns, dtype=jnp.int32))
    bases = jnp.arange(nblk, dtype=jnp.int32) * block
    (d2, idx), _ = jax.lax.scan(
        body, init,
        (sp.reshape(nblk, block, dim).transpose(0, 2, 1),
         sm.reshape(nblk, block), bases),
    )
    return d2, idx


@jax.custom_vjp
def _directed_mean_sq_nn(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
) -> jnp.ndarray:
    d2, _ = nn_distances(queries, supports, s_mask)
    w = q_mask.astype(queries.dtype)
    return jnp.sum(jnp.where(q_mask, d2, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


def _directed_fwd(queries, supports, q_mask, s_mask):
    d2, idx = nn_distances(queries, supports, s_mask)
    w = q_mask.astype(queries.dtype)
    nq = jnp.maximum(jnp.sum(w), 1.0)
    val = jnp.sum(jnp.where(q_mask, d2, 0.0)) / nq
    return val, (queries, supports, q_mask, idx, nq)


def _directed_bwd(res, g):
    # per-coordinate 1-D gathers/scatters: [N, 3] row gathers pad the 3-lane
    # trailing axis to the 128-lane tile on TPU (~42x wasted work)
    queries, supports, q_mask, idx, nq = res
    ns = supports.shape[0]
    safe = jnp.clip(idx, 0, ns - 1)
    dq_c, ds_c = [], []
    for c in range(queries.shape[1]):
        diff = jnp.where(q_mask, queries[:, c] - supports[safe, c], 0.0)
        dq = 2.0 * g / nq * diff
        dq_c.append(dq)
        ds_c.append(jnp.zeros_like(supports[:, c]).at[safe].add(-dq))
    return jnp.stack(dq_c, -1), jnp.stack(ds_c, -1), None, None


_directed_mean_sq_nn.defvjp(_directed_fwd, _directed_bwd)


def chamfer_distance(
    a: jnp.ndarray,
    b: jnp.ndarray,
    a_mask: Optional[jnp.ndarray] = None,
    b_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bidirectional Chamfer with the reference trainers' normalization."""
    if a_mask is None:
        a_mask = jnp.ones((a.shape[0],), dtype=bool)
    if b_mask is None:
        b_mask = jnp.ones((b.shape[0],), dtype=bool)
    return _directed_mean_sq_nn(a, b, a_mask, b_mask) + _directed_mean_sq_nn(
        b, a, b_mask, a_mask
    )
