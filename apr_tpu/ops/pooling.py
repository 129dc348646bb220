"""Segment pooling helpers over sentinel-padded index tables."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_mean_capped(
    values: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """Mean of ``values`` [N, F] per segment; ids == num_segments are dropped.

    Matches the barycenter pooling of the reference's C++ grid subsampling
    (grid_subsampling.cpp SampledData accumulation).
    """
    ids = jnp.minimum(segment_ids, num_segments)
    valid = segment_ids < num_segments
    s = jax.ops.segment_sum(
        jnp.where(valid[:, None], values, 0.0), ids, num_segments=num_segments + 1
    )[:num_segments]
    c = jax.ops.segment_sum(
        valid.astype(jnp.int32), ids, num_segments=num_segments + 1
    )[:num_segments]
    return s / jnp.maximum(c, 1)[:, None]


def gather_neighbors(
    feats: jnp.ndarray, neighbor_idx: jnp.ndarray
) -> jnp.ndarray:
    """Gather [Ns, F] features by a sentinel-padded table [Nq, K] -> [Nq, K, F].

    Sentinel index Ns yields a zero feature row — the shadow-point convention
    of the reference (blocks.py:269 pads features with a zero row before
    gathering).  Also accepts stacked clouds [P, Ns, F] + [P, Nq, K].
    """
    if feats.ndim == 3:
        return jax.vmap(gather_neighbors)(feats, neighbor_idx)
    ns = feats.shape[0]
    padded = jnp.concatenate([feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], 0)
    return padded[jnp.minimum(neighbor_idx, ns)]


def max_pool_neighbors(feats: jnp.ndarray, neighbor_idx: jnp.ndarray) -> jnp.ndarray:
    """Max over each row's neighbors; shadow rows contribute a ZERO feature.

    Exact parity with the reference's ``max_pool`` (blocks.py:86-103): despite
    its "minimum features" comment it pads with ``torch.zeros_like``, so the
    max is floored at 0 wherever a row has any shadow neighbor — a quirk that
    matters after leaky_relu (features can be negative) and is preserved here
    for checkpoint fidelity.  Also accepts stacked clouds [P, Ns, F].
    """
    if feats.ndim == 3:
        return jax.vmap(max_pool_neighbors)(feats, neighbor_idx)
    ns = feats.shape[0]
    padded = jnp.concatenate(
        [feats, jnp.zeros((1,) + feats.shape[1:], feats.dtype)], 0
    )
    gathered = padded[jnp.minimum(neighbor_idx, ns)]
    return jnp.max(gathered, axis=1)
