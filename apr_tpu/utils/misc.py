"""Misc utilities (FCGF_APR/util/misc.py parity).

- ``hash_pairs``: row-hash of index pairs by a seed multiplier (the
  reference's ``_hash`` used to exclude positive pairs from mined negatives,
  misc.py:6-16);
- ``extract_features``: the reference's single-cloud convenience API
  (misc.py:21-93): voxelize one cloud, run the encoder, return (downsampled
  xyz, per-point features) — the entry point users call to featurize a scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hash_pairs(arr: np.ndarray, seed: int) -> np.ndarray:
    """Row-hash [N, d] int arrays: sum_i arr[:, i] * seed^i."""
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    hash_vec = np.zeros(arr.shape[0], dtype=np.int64)
    for d in range(arr.shape[1]):
        hash_vec += arr[:, d].astype(np.int64) * (seed ** d)
    return hash_vec


def extract_features(
    trainer,
    state,
    points: np.ndarray,
    voxel_size: float = 0.3,
    capacities: Tuple[int, ...] = (16384, 8192, 4096, 2048),
    conv1_kernel_size: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Featurize one cloud with a trained FCGF-path encoder.

    Returns (xyz_down [nv, 3], features [nv, C]) over the occupied voxels.
    """
    from apr_tpu.models.sparse import build_pyramid
    from apr_tpu.ops.voxelize import voxelize

    n = len(points)
    cap = capacities[0]
    pts = np.zeros((max(n, 1), 3), np.float32)
    pts[:n] = points[:n]
    grid = voxelize(jnp.asarray(pts), voxel_size, cap)
    pyr = jax.vmap(
        lambda g: build_pyramid(g, capacities, conv1_kernel_size)
    )(jax.tree.map(lambda x: x[None], grid))
    feats_in = jnp.where(
        pyr.levels[0].mask[..., None], jnp.ones((1, cap, 1), jnp.float32), 0.0
    )
    out, _ = trainer._encode(
        state.params, state.batch_stats, feats_in, pyr, False
    )
    mask = np.asarray(pyr.levels[0].mask[0])
    rep = np.asarray(grid.rep)
    xyz = pts[np.minimum(rep, n - 1)]
    return xyz[mask], np.asarray(out[0])[mask]
