"""Correspondence generation: feature-space NN matching + GT radius matches.

Rebuilds, on device:
- ``find_corr`` / ``find_nn_gpu`` (FCGF_APR/scripts/test_apr.py:43-57;
  FCGF_APR/lib/eval.py:18-44): nearest neighbor in feature space,
- ``mutual_selection`` (Predator_APR/lib/benchmark_utils.py:271-295),
- ``get_matching_indices`` / ``get_correspondences`` GT radius matches under
  the ground-truth transform (FCGF_APR/util/pointcloud.py:53-66;
  Predator_APR/lib/benchmark_utils.py:121-135).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from apr_tpu.geometry.se3 import apply_transform
from apr_tpu.ops.chamfer import nn_distances
from apr_tpu.ops.neighbors import radius_neighbors


class Correspondences(NamedTuple):
    """Sentinel-padded correspondence set between two clouds."""

    src_idx: jnp.ndarray  # int32 [M]
    tgt_idx: jnp.ndarray  # int32 [M]
    mask: jnp.ndarray     # bool  [M]


def feature_nn_correspondences(
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Correspondences:
    """One correspondence per source point: its feature-space NN in cloud 1."""
    n0 = feats0.shape[0]
    if mask0 is None:
        mask0 = jnp.ones((n0,), bool)
    _, idx = nn_distances(feats0, feats1, s_mask=mask1)
    return Correspondences(
        src_idx=jnp.arange(n0, dtype=jnp.int32),
        tgt_idx=idx.astype(jnp.int32),
        mask=mask0 & (idx < feats1.shape[0]),
    )


def mutual_nn_correspondences(
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Correspondences:
    """Keep only pairs that are each other's feature-space NN."""
    n0 = feats0.shape[0]
    if mask0 is None:
        mask0 = jnp.ones((n0,), bool)
    _, idx01 = nn_distances(feats0, feats1, s_mask=mask1)
    _, idx10 = nn_distances(feats1, feats0, s_mask=mask0)
    back = idx10[jnp.clip(idx01, 0, feats1.shape[0] - 1)]
    mutual = back == jnp.arange(n0)
    return Correspondences(
        src_idx=jnp.arange(n0, dtype=jnp.int32),
        tgt_idx=idx01.astype(jnp.int32),
        mask=mask0 & mutual & (idx01 < feats1.shape[0]),
    )


def find_nn(
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask1: Optional[jnp.ndarray] = None,
):
    """Nearest neighbor in feature space: (idx [N0], sqdist [N0]).

    Replaces both find_nn_cpu (scipy cKDTree, FCGF_APR/lib/eval.py:9) and
    find_nn_gpu (chunked brute-force pdist, eval.py:18-44) — one streaming
    min-reduction serves both roles on TPU.
    """
    d2, idx = nn_distances(feats0, feats1, s_mask=mask1)
    return idx, d2


def pose_estimation(
    xyz0: jnp.ndarray,
    xyz1: jnp.ndarray,
    feats0: jnp.ndarray,
    feats1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
):
    """Convenience: feature matching + robust IRLS pose.

    Parity with the reference's pose_estimation
    (FCGF_APR/util/transform_estimation.py:119-144): max-similarity matching
    weighted by the similarity score, refined by est_quad_linear_robust.
    Returns (transform [4,4], weights [N0]).
    """
    from apr_tpu.geometry.robust import est_rigid_robust

    n1 = feats1.shape[0]
    corr = feature_nn_correspondences(feats0, feats1, mask0, mask1)
    matched = xyz1[jnp.clip(corr.tgt_idx, 0, n1 - 1)]
    # similarity weight = feature inner product of the matched pair
    f1m = feats1[jnp.clip(corr.tgt_idx, 0, n1 - 1)]
    weight = jnp.sum(feats0 * f1m, axis=1) * corr.mask
    t = est_rigid_robust(xyz0, matched, weight)
    return t, weight


def gt_correspondences(
    xyz0: jnp.ndarray,
    xyz1: jnp.ndarray,
    transform: jnp.ndarray,
    radius: float,
    cap_per_point: int,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
) -> Correspondences:
    """All (i, j) with ||T x0_i - x1_j|| < radius, like get_matching_indices.

    Fixed capacity: each source point contributes at most ``cap_per_point``
    matches (distance-sorted), giving a static [N0 * cap] table.
    """
    n0, n1 = xyz0.shape[0], xyz1.shape[0]
    if mask0 is None:
        mask0 = jnp.ones((n0,), bool)
    if mask1 is None:
        mask1 = jnp.ones((n1,), bool)
    warped = apply_transform(xyz0, transform)
    if cap_per_point == 1:
        # cap 1 = nearest-within-radius: the cell-key windowed NN is exact
        # for every pair within cell_size == radius and replaces the
        # O(N0*N1) brute search (measured 936 -> ~25 ms per 4-pair batch at
        # KITTI scale on v5e — the single hottest op of batch assembly).
        # Window bound: a tile's support window spans the 3 adjacent
        # x-slabs; with tile=512 sorted queries a slab-window of 8192
        # covers >5000 voxels per 3 x radius of x-depth — beyond worst-case
        # voxelized LiDAR density (a 0.45 m slab over a 50 m x 3 m section
        # of 0.3 m voxels holds <= ~1700).  Overflow truncates the +x edge
        # (those matches are silently dropped), so window is sized for the
        # dense-ground worst case, not the average
        # (tests/test_registration.py::test_gt_correspondences_dense_slab).
        from apr_tpu.ops.chamfer_window import windowed_nn_distances

        d2, idx = windowed_nn_distances(
            warped, xyz1, mask0, mask1,
            cell_size=float(radius), tile=512,
            window=min(8192, max(512, xyz1.shape[0])),
        )
        valid = (idx < n1) & (d2 <= radius * radius) & mask0
        src = jnp.arange(n0, dtype=jnp.int32)
        return Correspondences(
            src_idx=src,
            tgt_idx=jnp.where(valid, idx, 0).astype(jnp.int32),
            mask=valid,
        )
    nbr = radius_neighbors(
        warped, xyz1, radius, cap_per_point, q_mask=mask0, s_mask=mask1
    )  # [N0, cap]
    src = jnp.repeat(jnp.arange(n0, dtype=jnp.int32), cap_per_point)
    tgt = nbr.reshape(-1)
    valid = tgt < n1
    return Correspondences(
        src_idx=src, tgt_idx=jnp.where(valid, tgt, 0).astype(jnp.int32), mask=valid
    )
