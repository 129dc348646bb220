"""KITTI data layer tests over a generated fake KITTI-format tree."""

import os

import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.kitti import (
    KittiComplementDataset,
    find_complement_frames,
    generate_pairs,
    load_slam_poses,
    DEFAULT_SPLITS,
)
from apr_tpu.data.synthetic import synthetic_lidar_frame


@pytest.fixture(scope="module")
def fake_kitti(tmp_path_factory):
    """A KITTI-format tree: straight-line trajectory, 60 frames, 2 m spacing."""
    root = tmp_path_factory.mktemp("kitti")
    rng = np.random.default_rng(0)
    n_frames = 60
    for drive in (0,):
        seq = root / "sequences" / ("%02d" % drive)
        (seq / "velodyne").mkdir(parents=True)
        # calib: identity Tr
        with open(seq / "calib.txt", "w") as f:
            tr = np.eye(4)[:3].reshape(-1)
            f.write("Tr: " + " ".join(str(v) for v in tr) + "\n")
        poses = []
        for t in range(n_frames):
            # straight line along x at 2 m/frame, slight yaw wiggle
            pose = np.eye(4)
            pose[0, 3] = 2.0 * t
            poses.append(pose[:3].reshape(-1))
            pts = synthetic_lidar_frame(seed=t, n_points=4000, extent=30.0)
            xyzr = np.concatenate(
                [pts, np.ones((len(pts), 1), np.float32)], axis=1
            )
            xyzr.astype(np.float32).tofile(seq / "velodyne" / ("%06d.bin" % t))
        with open(seq / "poses.txt", "w") as f:
            for p in poses:
                f.write(" ".join(str(v) for v in p) + "\n")
        # odometry-pose layout for the baseline (non-APG) datasets
        (root / "poses").mkdir(exist_ok=True)
        with open(root / "poses" / ("%02d.txt" % drive), "w") as f:
            for p in poses:
                f.write(" ".join(str(v) for v in p) + "\n")
    return str(root)


def _cfg(root):
    return APRConfig(
        kitti_root=root,
        pair_min_dist=5.0,
        pair_max_dist=10.0,
        complement_pair_dist=4.0,
        num_complement_one_side=2,
        use_old_pose=False,
        random_scale=False,
    )


def test_load_slam_poses(fake_kitti):
    poses = load_slam_poses(os.path.join(fake_kitti, "sequences", "00"))
    assert poses.shape == (60, 4, 4)
    np.testing.assert_allclose(poses[10][0, 3], 20.0)


def test_complement_selection():
    ts = np.zeros((50, 3))
    ts[:, 0] = np.arange(50) * 2.0  # 2 m spacing
    skip, cmpl = find_complement_frames(
        ts, 20, complement_pair_dist=4.0, num_one_side=2, complement_range=8.0
    )
    assert not skip
    # left: last frame with distance > 4 (frame 17, d=6>4? frame 18 d=4 not >4
    # -> 17), then > 8 (frame 15)
    # order: [d>4 left, d>8 left, d>4 right, d>8 right]
    assert len(cmpl) == 4
    left, right = cmpl[:2], cmpl[2:]
    for f in left:
        assert f < 20 and np.linalg.norm(ts[f] - ts[20]) > 4.0
    for f in right:
        assert f > 20 and np.linalg.norm(ts[f] - ts[20]) > 4.0
    # edge frame: not enough left neighbors
    skip2, _ = find_complement_frames(ts, 1, 4.0, 2, 8.0)
    assert skip2


def test_generate_pairs_deterministic():
    ts = np.zeros((100, 3))
    ts[:, 0] = np.arange(100) * 2.0
    args = (ts, list(range(100)), 5.0, 10.0, 4.0, 2, 8.0)
    a = generate_pairs(*args)
    b = generate_pairs(*args)
    assert a == b
    assert len(a) > 3
    for t0, t1, c0, c1 in a:
        d = np.linalg.norm(ts[t1] - ts[t0])
        assert d >= 4.0  # pair distance near the sampled target
        assert len(c0) == 4 and len(c1) == 4


def test_dataset_get_pair(fake_kitti):
    cfg = _cfg(fake_kitti)
    ds = KittiComplementDataset(cfg, "train", splits={"train": [0]})
    assert len(ds) > 0
    pair = ds.get_pair(0)
    p0, p1, apc0, apc1, t_gt = (
        pair["points0"], pair["points1"], pair["apc0"], pair["apc1"],
        pair["t_gt"],
    )
    assert p0.shape[1] == 3 and p1.shape[1] == 3
    assert len(apc0) > 1000 and len(apc1) > 1000
    # APC cropped to key-frame radius
    assert (apc0 ** 2).sum(-1).max() <= (p0 ** 2).sum(-1).max() + 1e-3
    # GT transform is a rigid transform
    r = t_gt[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)
    # frames are ~5-10 m apart (pair_min/max_dist) up to the aug re-centering
    assert np.isfinite(t_gt).all()


def test_dataset_test_phase_no_neighbourhood(fake_kitti):
    cfg = _cfg(fake_kitti).replace(random_rotation=False)
    ds = KittiComplementDataset(cfg, "test", splits={"test": [0]})
    assert len(ds) > 0
    pair = ds.get_pair(0)
    assert pair["apc0"].shape[0] == 0  # no APC at test time
    # GT maps frame0 points into frame1: straight-line trajectory -> the
    # translation magnitude matches the frame distance
    drive, t0, t1 = ds.files[0][:3]
    d = 2.0 * abs(t1 - t0)
    np.testing.assert_allclose(
        np.linalg.norm(pair["t_gt"][:3, 3]), d, rtol=0.01
    )


def test_baseline_time_diff_pairs(fake_kitti):
    from apr_tpu.data.kitti import KittiBaselinePairDataset

    cfg = _cfg(fake_kitti).replace(kitti_max_time_diff=4)
    ds = KittiBaselinePairDataset(cfg, "train", "time_diff",
                                  splits={"train": [0]})
    # every (t, t+2) and (t, t+3) that exists: 58 + 57 pairs over 60 frames
    assert len(ds) == 58 + 57
    dts = {t1 - t0 for _, t0, t1 in ds.files}
    assert dts == {2, 3}
    pair = ds.get_pair(0)
    assert pair["apc0"].shape[0] == 0  # baselines carry no APC
    r = pair["t_gt"][:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_baseline_nm_pairs(fake_kitti):
    from apr_tpu.data.kitti import KittiBaselinePairDataset

    cfg = _cfg(fake_kitti).replace(random_rotation=False, random_scale=False)
    ds = KittiBaselinePairDataset(cfg, "test", "nm", splits={"test": [0]})
    assert len(ds) > 0
    for _, t0, t1 in ds.files:
        # straight line at 2 m/frame: >10 m means dt >= 6; the reference's
        # next[0]+curr-1 index quirk makes the selected frame dt-1 away
        assert (t1 - t0) >= 4
    pair = ds.get_pair(0)
    # unrefined odometry GT on exact poses: translation = frame distance
    _, t0, t1 = ds.files[0]
    np.testing.assert_allclose(
        np.linalg.norm(pair["t_gt"][:3, 3]), 2.0 * (t1 - t0), rtol=0.01)


def test_baseline_rand_dist_pairs(fake_kitti):
    from apr_tpu.data.kitti import KittiBaselinePairDataset

    cfg = _cfg(fake_kitti)
    a = KittiBaselinePairDataset(cfg, "train", "rand_dist",
                                 splits={"train": [0]})
    b = KittiBaselinePairDataset(cfg, "train", "rand_dist",
                                 splits={"train": [0]})
    assert a.files == b.files  # np.random.seed(0) determinism
    assert len(a) > 0


def test_baseline_factory_dispatch(fake_kitti):
    from apr_tpu.data.datasets import make_dataset
    from apr_tpu.data.kitti import KittiBaselinePairDataset, DEFAULT_SPLITS

    cfg = _cfg(fake_kitti).replace(dataset="KITTINMPairDataset")
    old = DEFAULT_SPLITS["train"]
    DEFAULT_SPLITS["train"] = [0]
    try:
        ds = make_dataset(cfg, "train")
    finally:
        DEFAULT_SPLITS["train"] = old
    assert isinstance(ds, KittiBaselinePairDataset)
    assert ds.mode == "nm"


def test_d3feat_augment_gt_consistent():
    """After the one-sided rotation / scale / shifts, the updated t_gt must
    still map points0 onto their true counterparts."""
    from apr_tpu.data.kitti import d3feat_augment

    rng0 = np.random.RandomState(3)
    pts = rng0.uniform(-40, 40, (500, 3)).astype(np.float32)
    # a known rigid GT: points1 = R @ points0 + t
    from scipy.spatial.transform import Rotation

    r = Rotation.from_euler("zyx", [0.3, -0.2, 0.5]).as_matrix()
    t = np.array([4.0, -2.0, 0.5])
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = r
    t_gt[:3, 3] = t
    pair = dict(
        points0=pts,
        points1=(pts @ r.T + t).astype(np.float32),
        apc0=pts[:100].copy(),
        apc1=(pts[:100] @ r.T + t).astype(np.float32),
        t_gt=t_gt,
        meta=np.zeros(3),
    )
    for seed in range(4):  # hit both sides of the rotation coin flip
        aug = d3feat_augment(dict(pair), np.random.RandomState(seed),
                             noise=0.0)
        mapped = aug["points0"] @ aug["t_gt"][:3, :3].T + aug["t_gt"][:3, 3]
        np.testing.assert_allclose(mapped, aug["points1"], atol=1e-3)


def test_d3feat_augment_wired(fake_kitti):
    cfg = _cfg(fake_kitti).replace(d3feat_augmentation=True)
    ds = KittiComplementDataset(cfg, "train", splits={"train": [0]})
    pair = ds.get_pair(0)
    mapped = pair["points0"] @ pair["t_gt"][:3, :3].T + pair["t_gt"][:3, 3]
    # GT stays consistent up to the injected per-point noise (0.01 box)
    # for at least the overlapping region: check the transform is rigid
    r = pair["t_gt"][:3, :3]
    np.testing.assert_allclose(r @ r.T * (1.0 / (r @ r.T)[0, 0]), np.eye(3),
                               atol=1e-4)
    assert np.isfinite(pair["t_gt"]).all()


def test_mutate_neighbour_fault_injection(fake_kitti):
    cfg = _cfg(fake_kitti).replace(mutate_neighbour_percentage=0.9)
    ds = KittiComplementDataset(cfg, "train", splits={"train": [0]})
    clean_cfg = _cfg(fake_kitti)
    ds_clean = KittiComplementDataset(clean_cfg, "train", splits={"train": [0]})
    a = ds.get_pair(0)["apc0"]
    b = ds_clean.get_pair(0)["apc0"]
    # corrupted rotations must change the aggregated cloud
    assert a.shape != b.shape or not np.allclose(a, b)


def test_vendored_benchmark_pair_files():
    """The LoKITTI / LoNuScenes fixed benchmark sets ship in-repo
    (reference: FCGF_APR/config/file_Lo*.npy, loaded at
    complement_data_loader.py:199-201 / :890-891) so `--LoKITTI true`
    needs no extra files at the dataset root."""
    import os

    import apr_tpu.data as data_pkg

    splits = os.path.join(os.path.dirname(data_pkg.__file__), "splits")
    lk = np.load(os.path.join(splits, "file_LoKITTI_50.npy"))
    assert lk.shape == (545, 3) and lk.dtype == np.int64
    # pairs come from the TEST drives 8-10 and are forward-ordered
    assert set(np.unique(lk[:, 0])) <= {8, 9, 10}
    assert (lk[:, 2] > lk[:, 1]).all()

    ln = np.load(os.path.join(splits, "file_LoNUSCENES_50.npy"),
                 allow_pickle=True)
    assert ln.shape == (994, 3)
    assert all(isinstance(r[0], str) and int(r[2]) > int(r[1]) for r in ln)
