"""Pallas TPU kernel: fused nearest-neighbor min-distance (+argmin).

The hot pairwise-distance reduction behind Chamfer loss and point matching
(the flash-attention-shaped op of point-cloud learning, SURVEY.md §5.7): for
each query point, the min squared distance to any support point and its
index — computed tile-by-tile in VMEM with a running (min, argmin)
accumulator, never materializing the [Nq, Ns] matrix in HBM.

Layout: points are passed transposed [3, N] so the long axis sits on the
128-wide lane dimension; outputs pack (d2, idx) as rows of an [8, Nq] f32
block (idx stored as f32 — exact for N < 2^24).

Grid: (query tiles, support tiles), support dim is the reduction
("arbitrary") axis with an [8, TQ] VMEM accumulator, matmul-kernel style.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _nn_kernel(q_ref, s_ref, m_ref, o_ref, acc_ref):
    ts = s_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.full_like(acc_ref, _BIG)

    qx = q_ref[0, :]
    qy = q_ref[1, :]
    qz = q_ref[2, :]
    sx = s_ref[0, :]
    sy = s_ref[1, :]
    sz = s_ref[2, :]

    dx = qx[:, None] - sx[None, :]
    dy = qy[:, None] - sy[None, :]
    dz = qz[:, None] - sz[None, :]
    d2 = dx * dx + dy * dy + dz * dz              # [TQ, TS]
    d2 = jnp.where(m_ref[0, :][None, :] > 0.0, d2, _BIG)

    tile_min = jnp.min(d2, axis=1)                # [TQ]
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.float32)
    base = (pl.program_id(1) * ts).astype(jnp.float32)

    best = acc_ref[0, :]
    better = tile_min < best
    acc_ref[0, :] = jnp.where(better, tile_min, best)
    acc_ref[1, :] = jnp.where(better, tile_arg + base, acc_ref[1, :])

    o_ref[...] = acc_ref[...]


@partial(jax.jit, static_argnames=("tq", "ts", "interpret"))
def nn_min_pallas(
    queries: jnp.ndarray,            # [Nq, 3]
    supports: jnp.ndarray,           # [Ns, 3]
    s_mask: Optional[jnp.ndarray] = None,
    tq: int = 512,
    ts: int = 1024,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(min sqdist [Nq] f32, argmin idx [Nq] int32; sentinel Ns if no valid
    support).  Equivalent to apr_tpu.ops.chamfer.nn_distances forward."""
    nq, ns = queries.shape[0], supports.shape[0]
    if s_mask is None:
        s_mask = jnp.ones((ns,), bool)

    nq_p = -(-nq // tq) * tq
    ns_p = -(-ns // ts) * ts
    qt = jnp.zeros((3, nq_p), jnp.float32).at[:, :nq].set(queries.T)
    st = jnp.zeros((3, ns_p), jnp.float32).at[:, :ns].set(supports.T)
    mt = jnp.zeros((1, ns_p), jnp.float32).at[0, :ns].set(
        s_mask.astype(jnp.float32)
    )

    out = pl.pallas_call(
        _nn_kernel,
        out_shape=jax.ShapeDtypeStruct((8, nq_p), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nq_p // tq, ns_p // ts),
            in_specs=[
                pl.BlockSpec((3, tq), lambda i, k: (0, i)),
                pl.BlockSpec((3, ts), lambda i, k: (0, k)),
                pl.BlockSpec((1, ts), lambda i, k: (0, k)),
            ],
            out_specs=pl.BlockSpec((8, tq), lambda i, k: (0, i)),
            scratch_shapes=[pltpu.VMEM((8, tq), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, st, mt)

    d2 = out[0, :nq]
    idx = out[1, :nq]
    none_valid = d2 >= _BIG * 0.5
    return (
        jnp.where(none_valid, jnp.inf, d2),
        jnp.where(none_valid, ns, idx.astype(jnp.int32)),
    )


def _auto_interpret() -> bool:
    # compiled Mosaic kernels need a real TPU; CPU test runs interpret
    return jax.default_backend() != "tpu"


@jax.custom_vjp
def directed_mean_sq_nn_pallas(
    queries: jnp.ndarray,
    supports: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked mean over queries of min squared NN distance (Pallas forward).

    Semantics match apr_tpu.ops.chamfer._directed_mean_sq_nn; the backward
    re-gathers the argmin support (cheap XLA gather/scatter) so no distance
    tiles are saved.
    """
    d2, _ = nn_min_pallas(queries, supports, s_mask,
                          interpret=_auto_interpret())
    w = q_mask.astype(queries.dtype)
    return jnp.sum(jnp.where(q_mask, d2, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)


def _pallas_fwd(queries, supports, q_mask, s_mask):
    d2, idx = nn_min_pallas(queries, supports, s_mask,
                            interpret=_auto_interpret())
    w = q_mask.astype(queries.dtype)
    nq = jnp.maximum(jnp.sum(w), 1.0)
    val = jnp.sum(jnp.where(q_mask, d2, 0.0)) / nq
    return val, (queries, supports, q_mask, idx, nq)


def _pallas_bwd(res, g):
    queries, supports, q_mask, idx, nq = res
    ns = supports.shape[0]
    resolved = (idx < ns) & q_mask
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


directed_mean_sq_nn_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def chamfer_distance_pallas(a, b, a_mask=None, b_mask=None):
    """Bidirectional Chamfer (reference normalization), Pallas min-kernel."""
    if a_mask is None:
        a_mask = jnp.ones((a.shape[0],), bool)
    if b_mask is None:
        b_mask = jnp.ones((b.shape[0],), bool)
    return directed_mean_sq_nn_pallas(a, b, a_mask, b_mask) + \
        directed_mean_sq_nn_pallas(b, a, b_mask, a_mask)
