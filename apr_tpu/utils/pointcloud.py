"""Point-cloud utilities (FCGF_APR/util/pointcloud.py parity).

Host-side numpy helpers: overlap ratios, GT matching indices, feature
evaluation — the Open3D-dependent pieces of the reference rebuilt on scipy
cKDTree (offline/eval-time use; the training path uses apr_tpu.ops on
device).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy.spatial import cKDTree


def apply_transform_np(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    return points @ transform[:3, :3].T + transform[:3, 3]


def get_matching_indices(
    source: np.ndarray,
    target: np.ndarray,
    trans: np.ndarray,
    search_voxel_size: float,
    k: Optional[int] = None,
) -> np.ndarray:
    """All (i, j) with ||T s_i - t_j|| < search_voxel_size
    (pointcloud.py:53-66 parity; K caps matches per source point)."""
    warped = apply_transform_np(source, trans)
    tree = cKDTree(target)
    out = []
    for i, p in enumerate(warped):
        idx = tree.query_ball_point(p, search_voxel_size)
        if k is not None:
            idx = idx[:k]
        out.extend((i, j) for j in idx)
    return np.asarray(out, dtype=np.int64).reshape(-1, 2)


def compute_overlap_ratio(
    pcd0: np.ndarray,
    pcd1: np.ndarray,
    trans: np.ndarray,
    voxel_size: float,
) -> float:
    """min of the two directed match ratios at 1-voxel tolerance
    (pointcloud.py compute_overlap_ratio parity)."""
    warped = apply_transform_np(pcd0, trans)
    d0, _ = cKDTree(pcd1).query(warped, k=1,
                                distance_upper_bound=voxel_size)
    d1, _ = cKDTree(warped).query(pcd1, k=1,
                                  distance_upper_bound=voxel_size)
    return float(min(np.isfinite(d0).mean(), np.isfinite(d1).mean()))


def evaluate_feature_match(
    feats0: np.ndarray,
    feats1: np.ndarray,
    xyz0: np.ndarray,
    xyz1: np.ndarray,
    trans: np.ndarray,
    inlier_thresh: float = 0.1,
) -> Tuple[float, np.ndarray]:
    """Feature-NN hit ratio under the GT transform (evaluate_feature_3dmatch
    style): fraction of matches within ``inlier_thresh`` after warping."""
    tree = cKDTree(feats1)
    _, nn = tree.query(feats0, k=1)
    warped = apply_transform_np(xyz0, trans)
    dist = np.linalg.norm(warped - xyz1[nn], axis=1)
    return float((dist < inlier_thresh).mean()), dist
