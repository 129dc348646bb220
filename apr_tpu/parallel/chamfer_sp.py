"""Sequence-parallel Chamfer: shard the pairwise reduction across the mesh.

The reference never distributes its Chamfer (single-GPU chamferdist,
FCGF_APR/lib/complement_trainer.py:446-448).  For clouds too large for one
chip's step budget, the SURVEY §2.4/§5.7 "sequence-parallel analog" is:
shard the QUERY axis of each directed pass across the mesh's data axis
(each device owns Nq/D queries and a full replica of the supports — the
support set is the small, reusable side), compute the local masked sum of
min squared NN distances, and `psum` the (sum, count) pair over ICI.  Both
directions reuse the same layout with roles swapped, so a bidirectional
Chamfer costs two sharded passes + two scalar all-reduces.

Gradients flow through the same custom VJP as the single-chip path
(re-gather of the argmin support), with the scatter landing on the local
query shard; XLA inserts the transpose-collectives automatically.

Use via ``shard_map`` (this module exposes the per-shard body and a
convenience wrapper):

    mesh = make_mesh()
    cd = chamfer_distance_sp(mesh)(a, b, a_mask, b_mask)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from apr_tpu.ops.chamfer import _directed_mean_sq_nn


def _directed_sharded(queries, supports, q_mask, s_mask):
    """Per-shard body: local (masked sum, count) -> psum over 'data'."""
    d2_mean_local = _directed_mean_sq_nn(queries, supports, q_mask, s_mask)
    w_local = jnp.sum(q_mask.astype(queries.dtype))
    sum_local = d2_mean_local * jnp.maximum(w_local, 1.0)
    total = jax.lax.psum(sum_local, "data")
    count = jax.lax.psum(w_local, "data")
    return total / jnp.maximum(count, 1.0)


def chamfer_distance_sp(mesh, axis: str = "data"):
    """Build a mesh-sharded bidirectional Chamfer.

    Returns f(a, b, a_mask, b_mask) -> scalar with a/a_mask sharded on the
    query axis in the a->b pass and b/b_mask sharded in the b->a pass;
    inputs may be passed unsharded (shard_map partitions them).  Row counts
    must divide the mesh size (pad with masked rows otherwise).
    """
    try:
        from jax import shard_map  # jax >= 0.8 spelling
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    sharded = P(axis, None)
    sharded1 = P(axis)
    repl = P(None, None)
    repl1 = P(None)

    # check_vma off: the scan carry inside nn_distances is built from
    # constants (unvarying) while the body output varies over 'data'; the
    # collective correctness here is the explicit psum, not the rep checker
    try:
        directed = shard_map(
            _directed_sharded, mesh=mesh,
            in_specs=(sharded, repl, sharded1, repl1),
            out_specs=P(), check_vma=False,
        )
    except TypeError:  # older jax spells it check_rep
        directed = shard_map(
            _directed_sharded, mesh=mesh,
            in_specs=(sharded, repl, sharded1, repl1),
            out_specs=P(), check_rep=False,
        )

    def f(a, b, a_mask=None, b_mask=None):
        if a_mask is None:
            a_mask = jnp.ones((a.shape[0],), bool)
        if b_mask is None:
            b_mask = jnp.ones((b.shape[0],), bool)
        return directed(a, b, a_mask, b_mask) + directed(b, a, b_mask, a_mask)

    return f
