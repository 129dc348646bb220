import numpy as np
import pytest

from apr_tpu.geometry.icp import ICPResult, information_matrix, registration_icp
from apr_tpu.geometry.pose_graph import (
    PoseGraph, PoseGraphEdge, PoseGraphNode, global_optimization,
    se3_exp, se3_log,
)
from apr_tpu.data.multiway import multiway_complement_transforms


def _cloud(rng, n=2000, extent=10.0):
    # structured: two planes + noise, so ICP has constraints in all axes
    a = rng.uniform(-extent, extent, (n // 2, 2))
    ground = np.column_stack([a, 0.05 * np.sin(a[:, 0])])
    b = rng.uniform(-extent, extent, (n - n // 2, 2))
    wall = np.column_stack([b[:, 0], 0.2 * np.cos(b[:, 0]), b[:, 1] * 0.3 + 1])
    return np.concatenate([ground, wall]).astype(np.float64)


def _rigid(rng, rot=0.05, trans=0.3):
    from scipy.spatial.transform import Rotation

    t = np.eye(4)
    t[:3, :3] = Rotation.from_rotvec(rng.uniform(-rot, rot, 3)).as_matrix()
    t[:3, 3] = rng.uniform(-trans, trans, 3)
    return t


def test_se3_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = rng.uniform(-1, 1, 6)
        np.testing.assert_allclose(se3_log(se3_exp(xi)), xi, atol=1e-8)


def test_icp_refines_perturbed_init(rng):
    cloud = _cloud(rng)
    t_gt = _rigid(rng)
    target = cloud @ t_gt[:3, :3].T + t_gt[:3, 3]
    # init is the GT perturbed a little (odometry-noise scenario)
    init = _rigid(rng, rot=0.02, trans=0.1) @ t_gt
    res = registration_icp(cloud, target, 0.3, init, max_iteration=100)
    err = np.linalg.norm(res.transformation - t_gt)
    assert err < 0.02, err
    assert res.fitness > 0.9


def test_icp_identity_on_same_cloud(rng):
    cloud = _cloud(rng, n=500)
    res = registration_icp(cloud, cloud, 0.2)
    np.testing.assert_allclose(res.transformation, np.eye(4), atol=1e-9)
    assert res.inlier_rmse < 1e-9


def test_information_matrix_psd(rng):
    cloud = _cloud(rng, n=500)
    info = information_matrix(cloud, cloud, 0.2, np.eye(4))
    assert info.shape == (6, 6)
    eig = np.linalg.eigvalsh(info)
    assert (eig >= -1e-6).all()
    assert eig.max() > 0


def test_pose_graph_closes_loop(rng):
    """3-node chain with noisy odometry edges + exact loop closure: the
    optimizer must pull node poses toward consistency."""
    t01 = _rigid(rng, rot=0.1, trans=1.0)
    t12 = _rigid(rng, rot=0.1, trans=1.0)
    t02 = t12 @ t01  # exact composite: x0 -> x2

    # noisy initial nodes (node-to-ref with ref=node0)
    n1_init = _rigid(rng, rot=0.05, trans=0.3) @ np.linalg.inv(t01)
    n2_init = _rigid(rng, rot=0.05, trans=0.3) @ np.linalg.inv(t02)
    graph = PoseGraph(
        nodes=[PoseGraphNode(np.eye(4)), PoseGraphNode(n1_init),
               PoseGraphNode(n2_init)],
        edges=[
            PoseGraphEdge(0, 1, t01, np.eye(6) * 100, uncertain=False),
            PoseGraphEdge(1, 2, t12, np.eye(6) * 100, uncertain=False),
            PoseGraphEdge(0, 2, t02, np.eye(6) * 100, uncertain=True),
        ],
    )
    graph = global_optimization(graph, max_iterations=50)
    # residuals after optimization must be small
    for e, want in ((graph.edges[0], t01), (graph.edges[2], t02)):
        xi = graph.nodes[e.source].pose
        xj = graph.nodes[e.target].pose
        r = se3_log(np.linalg.inv(want) @ np.linalg.inv(xj) @ xi)
        assert np.linalg.norm(r) < 0.05, (e.source, e.target, r)


def test_multiway_complement_transforms(rng):
    """Key frame + 2 complements (1/side) with noisy inits: multiway ICP must
    recover transforms that align complements onto the key frame."""
    world = _cloud(rng, n=3000, extent=15.0)
    t_a = _rigid(rng, rot=0.05, trans=2.0)   # cmpl A -> key (GT)
    t_b = _rigid(rng, rot=0.05, trans=2.0)
    inv = np.linalg.inv
    cloud_key = world
    cloud_a = world @ inv(t_a)[:3, :3].T + inv(t_a)[:3, 3]
    cloud_b = world @ inv(t_b)[:3, :3].T + inv(t_b)[:3, 3]

    init_a = _rigid(rng, rot=0.01, trans=0.1) @ t_a
    init_b = _rigid(rng, rot=0.01, trans=0.1) @ t_b
    out = multiway_complement_transforms(
        cloud_key, [cloud_a, cloud_b], [init_a, init_b],
        num_one_side=1, icp_voxel_size=0.2, max_corr_fine=0.4,
    )
    for got, want in zip(out, (t_a, t_b)):
        err = np.linalg.norm(got - want)
        assert err < 0.05, err


def test_se3_log_near_pi(rng):
    """se3_log must be stable for ~180-degree rotations (0/0 in the naive
    vee form) — log/exp must round-trip."""
    from scipy.spatial.transform import Rotation

    from apr_tpu.geometry.pose_graph import se3_exp, se3_log

    for axis in ([1, 0, 0], [0, 1, 0], [0.6, -0.8, 0.0], [0.5, 0.5, 0.7]):
        a = np.asarray(axis, np.float64)
        a = a / np.linalg.norm(a)
        for ang in (np.pi, np.pi - 1e-8, np.pi - 1e-5):
            t = np.eye(4)
            t[:3, :3] = Rotation.from_rotvec(a * ang).as_matrix()
            t[:3, 3] = [1.0, -2.0, 0.5]
            xi = se3_log(t)
            assert np.isfinite(xi).all(), (axis, ang, xi)
            t2 = se3_exp(xi)
            np.testing.assert_allclose(t2, t, atol=1e-5)
