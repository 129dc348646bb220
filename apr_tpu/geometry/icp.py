"""Point-to-point ICP for offline GT preparation.

Replaces Open3D's ``registration_icp`` in the reference's hidden first-epoch
preprocessing stage (complement_data_loader.py:384-387: max_corr_dist 0.2,
point-to-point, max_iteration 200) which refines odometry poses into the
``icp/`` cache.  This is host-side numpy + scipy cKDTree — it runs once per
pair offline (tools/prepare_icp_cache.py), not in the training hot path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
from scipy.spatial import cKDTree


class ICPResult(NamedTuple):
    transformation: np.ndarray  # [4, 4]
    fitness: float              # matched fraction of source points
    inlier_rmse: float
    num_iterations: int


def _best_fit_transform(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """Kabsch (numpy) for the ICP inner step."""
    mu_s = src.mean(0)
    mu_t = tgt.mean(0)
    cov = (src - mu_s).T @ (tgt - mu_t)
    u, _, vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    t = mu_t - r @ mu_s
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def registration_icp(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence_distance: float = 0.2,
    init: Optional[np.ndarray] = None,
    max_iteration: int = 200,
    relative_fitness: float = 1e-6,
    relative_rmse: float = 1e-6,
) -> ICPResult:
    """Open3D registration_icp-compatible point-to-point ICP.

    Convergence mirrors o3d's ICPConvergenceCriteria: stop when the relative
    change of fitness and inlier RMSE both drop below the thresholds.
    """
    t = np.eye(4) if init is None else np.array(init, dtype=np.float64)
    tree = cKDTree(target)
    src = source.astype(np.float64)

    prev_fitness, prev_rmse = 0.0, 0.0
    fitness, rmse = 0.0, 0.0
    it = 0
    for it in range(max_iteration):
        warped = src @ t[:3, :3].T + t[:3, 3]
        dist, idx = tree.query(
            warped, k=1, distance_upper_bound=max_correspondence_distance
        )
        ok = np.isfinite(dist)
        n_ok = int(ok.sum())
        fitness = n_ok / max(len(src), 1)
        rmse = float(np.sqrt((dist[ok] ** 2).mean())) if n_ok else 0.0
        if n_ok < 3:
            break
        delta = _best_fit_transform(warped[ok], target[idx[ok]])
        t = delta @ t
        if (
            it > 0
            and abs(fitness - prev_fitness) < relative_fitness
            and abs(rmse - prev_rmse) < relative_rmse
        ):
            break
        prev_fitness, prev_rmse = fitness, rmse

    return ICPResult(
        transformation=t, fitness=fitness, inlier_rmse=rmse,
        num_iterations=it + 1,
    )


def information_matrix(
    source: np.ndarray,
    target: np.ndarray,
    max_correspondence_distance: float,
    transformation: np.ndarray,
) -> np.ndarray:
    """Open3D get_information_matrix_from_point_clouds parity.

    G_ij = sum over correspondences of J^T J where J = [skew(-q) | I] for the
    target point q of each correspondence (o3d convention).
    """
    tree = cKDTree(target)
    warped = source @ transformation[:3, :3].T + transformation[:3, 3]
    dist, idx = tree.query(
        warped, k=1, distance_upper_bound=max_correspondence_distance
    )
    ok = np.isfinite(dist)
    q = target[idx[ok]]
    n = len(q)
    g = np.zeros((6, 6))
    if n == 0:
        return g
    # J rows per point: [ [0, z, -y, 1, 0, 0], [-z, 0, x, 0, 1, 0],
    #                     [y, -x, 0, 0, 0, 1] ]
    x, y, z = q[:, 0], q[:, 1], q[:, 2]
    zeros = np.zeros(n)
    ones = np.ones(n)
    j0 = np.stack([zeros, z, -y, ones, zeros, zeros], 1)
    j1 = np.stack([-z, zeros, x, zeros, ones, zeros], 1)
    j2 = np.stack([y, -x, zeros, zeros, zeros, ones], 1)
    g = j0.T @ j0 + j1.T @ j1 + j2.T @ j2
    return g
