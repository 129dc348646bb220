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
