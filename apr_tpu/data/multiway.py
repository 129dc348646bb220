"""Multiway registration of complement frames (APG, old-pose path).

Reference full_registration / multiway_registration
(complement_data_loader.py:425-516): per side, build a pose graph over
[key frame + K complements] — odometry-chain edges certain, all other pairs
uncertain loop closures — with pairwise ICP initialized from the
velo2cam-chained odometry poses, then Levenberg-Marquardt global
optimization; the result is each complement's transform into the key frame.
Runs offline (tools/prepare_icp_cache.py) and writes the reference's exact
cache layout {icp_path}/{drive}_{t_cmpl}_{t_key}.npy.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from apr_tpu.geometry.icp import information_matrix, registration_icp
from apr_tpu.geometry.pose_graph import (
    PoseGraph,
    PoseGraphEdge,
    PoseGraphNode,
    global_optimization,
)


def _voxel_dedup(points: np.ndarray, voxel: float) -> np.ndarray:
    """First-point-per-voxel downsample (ME.sparse_quantize sel parity)."""
    coords = np.floor(points / voxel).astype(np.int64)
    _, sel = np.unique(coords, axis=0, return_index=True)
    return points[np.sort(sel)]


def pairwise_registration(
    source: np.ndarray,
    target: np.ndarray,
    init: np.ndarray,
    max_corr_fine: float = 0.2,
):
    """ICP source->target from the odometry init; returns (T, info 6x6)."""
    reg = registration_icp(source, target, max_corr_fine, init,
                           max_iteration=200)
    info = information_matrix(source, target, max_corr_fine,
                              reg.transformation)
    return reg.transformation, info


def full_registration(
    clouds: Sequence[np.ndarray],
    init_transforms: Sequence[np.ndarray],
    max_corr_fine: float = 0.2,
) -> List[np.ndarray]:
    """Pose-graph optimize one side; clouds[0] is the key frame.

    ``init_transforms[i]`` maps cloud i into the key frame (odometry-derived
    initialization).  Returns node poses (cloud i -> key frame), node 0 = I.
    """
    n = len(clouds)
    graph = PoseGraph(nodes=[PoseGraphNode(np.eye(4)) for _ in range(n)])
    # reference builds nodes as inv(odometry-chain); we initialize directly
    # from the supplied transforms, which is the same fixed point
    for i in range(n):
        graph.nodes[i].pose = init_transforms[i].copy()

    for s in range(n):
        for t in range(s + 1, n):
            init = np.linalg.inv(init_transforms[t]) @ init_transforms[s]
            t_icp, info = pairwise_registration(
                clouds[s], clouds[t], init, max_corr_fine
            )
            graph.edges.append(
                PoseGraphEdge(s, t, t_icp, info, uncertain=(t != s + 1))
            )
    graph = global_optimization(graph, reference_node=0)
    # express every node relative to the key frame (node 0)
    inv0 = np.linalg.inv(graph.nodes[0].pose)
    return [inv0 @ graph.nodes[i].pose for i in range(n)]


def multiway_complement_transforms(
    xyz_key: np.ndarray,
    xyz_cmpls: Sequence[np.ndarray],
    init_transforms: Sequence[np.ndarray],
    num_one_side: int,
    icp_voxel_size: float = 0.05,
    max_corr_fine: float = 0.2,
) -> List[np.ndarray]:
    """Reference multiway_registration parity: optimize left/right sides
    separately; returns one transform per complement frame into the key
    frame.  ``init_transforms[i]`` is the odometry-based initial guess for
    complement i (same order: K left then K right)."""
    key_ds = _voxel_dedup(xyz_key, icp_voxel_size)
    cmpl_ds = [_voxel_dedup(x, icp_voxel_size) for x in xyz_cmpls]

    left = [key_ds] + list(cmpl_ds[:num_one_side])
    right = [key_ds] + list(cmpl_ds[num_one_side:])
    init_left = [np.eye(4)] + list(init_transforms[:num_one_side])
    init_right = [np.eye(4)] + list(init_transforms[num_one_side:])

    out_left = full_registration(left, init_left, max_corr_fine)[1:]
    out_right = full_registration(right, init_right, max_corr_fine)[1:]
    return out_left + out_right
