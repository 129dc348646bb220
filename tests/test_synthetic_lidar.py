"""LiDAR-structured synthetic scans (data/synthetic.py round-5 A/B arm)."""

import numpy as np

from apr_tpu.data.synthetic import synthetic_pair


def _on_ring_fraction(pts, n_rings=48, lo=-0.42, hi=0.07, tol=0.36):
    """Fraction of points whose elevation sits within ``tol`` ring-spacings
    of a ring center — ~1.0 for ring-structured scans, ~2*tol for any
    elevation-continuous sampling."""
    r = np.linalg.norm(pts, axis=1)
    elev = np.arcsin(np.clip(pts[:, 2] / np.maximum(r, 1e-6), -1, 1))
    ring_f = (elev - lo) / (hi - lo) * (n_rings - 1)
    return float((np.abs(ring_f - np.rint(ring_f)) < tol).mean())


def test_structured_scan_has_rings_and_gt_holds():
    p = synthetic_pair(seed=5, n_points=7000, apc_points=7000, distance=20.0,
                       extent=60.0, max_range=35.0, lidar_structured=True)
    u = synthetic_pair(seed=5, n_points=7000, apc_points=7000, distance=20.0,
                       extent=60.0, max_range=35.0, lidar_structured=False)
    # elevations cluster on the discrete ring grid; the uniform arm is
    # elevation-continuous so only ~2*tol of it lands near ring centers
    assert _on_ring_fraction(p["points0"]) > 0.9
    assert _on_ring_fraction(u["points0"]) < 0.85
    # GT still maps frame0 into frame1: nearest-neighbor overlap is
    # substantial at 20 m
    from scipy.spatial import cKDTree

    a = p["points0"] @ p["t_gt"][:3, :3].T + p["t_gt"][:3, 3]
    d, _ = cKDTree(p["points1"]).query(a, k=1)
    assert np.mean(d < 0.5) > 0.3
    assert len(p["points0"]) > 1000


def test_structured_occlusion_shadows():
    """The depth buffer keeps the NEAREST return per beam, so each (ring,
    azimuth) beam direction appears at most once — true self-occlusion the
    Bernoulli thinning cannot produce."""
    p = synthetic_pair(seed=11, n_points=9000, apc_points=4, distance=10.0,
                       extent=50.0, max_range=35.0, lidar_structured=True)
    pts = p["points0"]
    r = np.linalg.norm(pts, axis=1)
    az = np.arctan2(pts[:, 1], pts[:, 0])
    elev = np.arcsin(np.clip(pts[:, 2] / np.maximum(r, 1e-6), -1, 1))
    ring = np.rint((elev + 0.42) / (0.07 + 0.42) * 47).astype(int)
    azb = np.floor((az + np.pi) / (2 * np.pi) * 2048).astype(int)
    bins = ring * 2048 + np.clip(azb, 0, 2047)
    _, counts = np.unique(bins, return_counts=True)
    # noise can nudge a point across a bin edge; near-unique is the claim
    assert (counts == 1).mean() > 0.95


def test_structured_multiview_apc():
    p = synthetic_pair(seed=7, n_points=6000, apc_points=8000, distance=15.0,
                       extent=60.0, max_range=35.0, apc_complement_dist=10.0,
                       lidar_structured=True)
    # APC crops to the key frame's radius and carries real points
    assert len(p["apc0"]) > 2000
    assert np.linalg.norm(p["apc0"], axis=1).max() <= 35.0 + 1.0
