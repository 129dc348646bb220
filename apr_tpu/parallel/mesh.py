"""Device mesh + sharding helpers.

The reference trains on exactly one GPU (SURVEY.md §2.4 — no
torch.distributed anywhere); the TPU build's first-class analog is batch data
parallelism over ICI: pairs shard across chips on a 1-D ``Mesh(('data',))``,
parameters replicate, and gradient all-reduce rides XLA's collectives
automatically under jit.  Bigger meshes (multi-host DCN) run the same
program unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[Any]] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Place a pytree of [B, ...] arrays with B sharded across the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (parameters / optimizer state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
