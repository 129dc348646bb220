"""Native C++ host-geometry library vs numpy/scipy references."""

import numpy as np
import pytest

from apr_tpu import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def test_grid_subsample_matches_numpy(lib, rng):
    pts = rng.uniform(-10, 10, (5000, 3)).astype(np.float32)
    got, _ = native.grid_subsample(pts, 0.5)
    coords = np.floor(pts / 0.5).astype(np.int64)
    uniq, inv, cnt = np.unique(coords, axis=0, return_inverse=True,
                               return_counts=True)
    assert len(got) == len(uniq)
    acc = np.zeros((len(uniq), 3))
    np.add.at(acc, inv, pts)
    want = acc / cnt[:, None]
    # same barycenter set (order may differ: arrival vs lexicographic)
    got_s = set(map(tuple, np.round(got, 4)))
    want_s = set(map(tuple, np.round(want.astype(np.float32), 4)))
    assert got_s == want_s


def test_grid_subsample_features(lib, rng):
    pts = rng.uniform(-5, 5, (1000, 3)).astype(np.float32)
    feats = rng.normal(size=(1000, 4)).astype(np.float32)
    p, f = native.grid_subsample(pts, 1.0, features=feats)
    assert f is not None and len(p) == len(f)
    # spot check one voxel
    coords = np.floor(pts / 1.0).astype(np.int64)
    c0 = coords[0]
    members = (coords == c0).all(1)
    want_p = pts[members].mean(0)
    i = np.argmin(np.linalg.norm(p - want_p, axis=1))
    np.testing.assert_allclose(p[i], want_p, atol=1e-4)
    np.testing.assert_allclose(f[i], feats[members].mean(0), atol=1e-4)


def test_voxel_dedup(lib, rng):
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    sel = native.voxel_dedup(pts, 0.5)
    coords = np.floor(pts / 0.5).astype(np.int64)
    n_uniq = len(np.unique(coords, axis=0))
    assert len(sel) == n_uniq
    # selected points cover each voxel exactly once
    sel_coords = coords[sel]
    assert len(np.unique(sel_coords, axis=0)) == n_uniq
    # each selected index is the FIRST point of its voxel
    first = {}
    for i, c in enumerate(map(tuple, coords)):
        first.setdefault(c, i)
    for s in sel:
        assert first[tuple(coords[s])] == s


def test_radius_neighbors_matches_scipy(lib, rng):
    from scipy.spatial import cKDTree

    q = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    r, cap = 0.8, 16
    out = native.radius_neighbors(q, s, r, cap)
    tree = cKDTree(s)
    for i in range(300):
        want = sorted(tree.query_ball_point(q[i], r),
                      key=lambda j: np.linalg.norm(s[j] - q[i]))[:cap]
        got = [j for j in out[i] if j < 2000]
        # same set; ties may reorder
        d_want = sorted(np.linalg.norm(s[want] - q[i], axis=1))
        d_got = sorted(np.linalg.norm(s[got] - q[i], axis=1))
        np.testing.assert_allclose(d_got, d_want, atol=1e-5)
        assert (out[i][len(got):] == 2000).all()


def test_radius_neighbors_empty(lib):
    q = np.zeros((4, 3), np.float32)
    s = np.full((10, 3), 100.0, np.float32)
    out = native.radius_neighbors(q, s, 1.0, 8)
    assert (out == 10).all()
