"""Benchmark utilities (Predator_APR/lib/benchmark_utils.py parity).

- inlier ratio under the GT transform (:227-268),
- feature-match-recall sweeps over inlier-ratio / distance thresholds
  (:18-54),
- mutual selection of score matrices (:271-295),
- angle deviation (:170-185) — see apr_tpu.geometry.se3.rotation_angle_deg,
- ransac_pose_estimation (:187-225) — see apr_tpu.registration.ransac.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.geometry.se3 import apply_transform
from apr_tpu.ops.chamfer import nn_distances


def get_inlier_ratio(
    src_pcd: jnp.ndarray,
    tgt_pcd: jnp.ndarray,
    src_feat: jnp.ndarray,
    tgt_feat: jnp.ndarray,
    t_gt: jnp.ndarray,
    src_mask: Optional[jnp.ndarray] = None,
    tgt_mask: Optional[jnp.ndarray] = None,
    inlier_distance_threshold: float = 0.1,
) -> Dict[str, jnp.ndarray]:
    """Fraction of feature-NN matches within the GT-inlier distance, both
    directions plus the mutual subset (benchmark_utils.py:227-268)."""
    n, m = src_pcd.shape[0], tgt_pcd.shape[0]
    if src_mask is None:
        src_mask = jnp.ones((n,), bool)
    if tgt_mask is None:
        tgt_mask = jnp.ones((m,), bool)
    warped = apply_transform(src_pcd, t_gt)

    _, idx01 = nn_distances(src_feat, tgt_feat, s_mask=tgt_mask)
    _, idx10 = nn_distances(tgt_feat, src_feat, s_mask=src_mask)
    idx01c = jnp.clip(idx01, 0, m - 1)
    idx10c = jnp.clip(idx10, 0, n - 1)

    d01 = jnp.linalg.norm(warped - tgt_pcd[idx01c], axis=1)
    d10 = jnp.linalg.norm(tgt_pcd - warped[idx10c], axis=1)
    w0 = src_mask.astype(jnp.float32)
    w1 = tgt_mask.astype(jnp.float32)
    in0 = jnp.sum((d01 < inlier_distance_threshold) * w0) / jnp.maximum(
        jnp.sum(w0), 1.0
    )
    in1 = jnp.sum((d10 < inlier_distance_threshold) * w1) / jnp.maximum(
        jnp.sum(w1), 1.0
    )

    mutual = (idx10[idx01c] == jnp.arange(n)) & src_mask
    wm = mutual.astype(jnp.float32)
    in_mutual = jnp.sum((d01 < inlier_distance_threshold) * wm) / jnp.maximum(
        jnp.sum(wm), 1.0
    )
    return dict(
        inlier_ratio_src=in0,
        inlier_ratio_tgt=in1,
        inlier_ratio=0.5 * (in0 + in1),
        inlier_ratio_mutual=in_mutual,
    )


def feature_match_recall_sweep(
    inlier_ratios: Sequence[float],
    ratio_thresholds: Sequence[float] = tuple(np.arange(0, 0.21, 0.01)),
) -> np.ndarray:
    """FMR as a function of the required inlier ratio (:18-54): fraction of
    pairs whose inlier ratio exceeds each threshold."""
    arr = np.asarray(inlier_ratios)[None, :]
    th = np.asarray(ratio_thresholds)[:, None]
    return (arr > th).mean(axis=1)


def mutual_selection(score_mat: jnp.ndarray) -> jnp.ndarray:
    """Boolean [N, M] mask of entries that are the argmax of both their row
    and their column (benchmark_utils.py:271-295)."""
    row_max = score_mat == jnp.max(score_mat, axis=1, keepdims=True)
    col_max = score_mat == jnp.max(score_mat, axis=0, keepdims=True)
    return row_max & col_max
