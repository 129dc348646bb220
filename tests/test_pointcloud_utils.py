import numpy as np

from apr_tpu.utils.files import sorted_alphanum
from apr_tpu.utils.pointcloud import (
    compute_overlap_ratio,
    evaluate_feature_match,
    get_matching_indices,
)


def _rigid():
    from scipy.spatial.transform import Rotation

    t = np.eye(4)
    t[:3, :3] = Rotation.from_euler("zyx", [0.2, -0.1, 0.05]).as_matrix()
    t[:3, 3] = [1.0, -2.0, 0.5]
    return t


def test_get_matching_indices(rng):
    t = _rigid()
    src = rng.uniform(-5, 5, (100, 3))
    tgt = src @ t[:3, :3].T + t[:3, 3]
    m = get_matching_indices(src, tgt, t, 0.05)
    assert set(map(tuple, m)) >= {(i, i) for i in range(100)}


def test_compute_overlap_ratio(rng):
    t = _rigid()
    src = rng.uniform(-5, 5, (500, 3))
    tgt = np.concatenate([src @ t[:3, :3].T + t[:3, 3],
                          rng.uniform(50, 60, (500, 3))])
    r = compute_overlap_ratio(src, tgt, t, 0.1)
    # src fully matched; tgt only half matched -> min = 0.5
    np.testing.assert_allclose(r, 0.5, atol=0.02)


def test_evaluate_feature_match(rng):
    t = _rigid()
    src = rng.uniform(-5, 5, (200, 3))
    tgt = src @ t[:3, :3].T + t[:3, 3]
    feats = rng.normal(size=(200, 8))
    hit, dist = evaluate_feature_match(feats, feats, src, tgt, t)
    assert hit == 1.0
    assert dist.max() < 1e-6


def test_sorted_alphanum():
    files = ["f10.bin", "f2.bin", "f1.bin"]
    assert sorted_alphanum(files) == ["f1.bin", "f2.bin", "f10.bin"]
