"""Indoor (3DMatch) + ModelNet legacy dataset surfaces over generated data."""

import os
import pickle

import numpy as np
import pytest

from apr_tpu.config import APRConfig
from apr_tpu.data.datasets import make_dataset


@pytest.fixture(scope="module")
def fake_indoor(tmp_path_factory):
    root = tmp_path_factory.mktemp("indoor")
    rng = np.random.default_rng(0)
    os.makedirs(root / "frags", exist_ok=True)
    infos = {"rot": [], "trans": [], "src": [], "tgt": [], "overlap": []}
    for i in range(3):
        cloud = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        from scipy.spatial.transform import Rotation

        rot = Rotation.from_euler("zyx", rng.uniform(-1, 1, 3)).as_matrix()
        trans = rng.uniform(-0.5, 0.5, (3, 1))
        tgt = cloud @ rot.T + trans[:, 0]
        np.save(root / "frags" / f"src_{i}.npy", cloud)
        np.save(root / "frags" / f"tgt_{i}.npy", tgt.astype(np.float32))
        infos["rot"].append(rot)
        infos["trans"].append(trans)
        infos["src"].append(f"frags/src_{i}.npy")
        infos["tgt"].append(f"frags/tgt_{i}.npy")
        infos["overlap"].append(0.8)
    with open(root / "train_info.pkl", "wb") as f:
        pickle.dump(infos, f)
    with open(root / "test_info.pkl", "wb") as f:
        pickle.dump(infos, f)
    return str(root)


def test_indoor_dataset(fake_indoor):
    cfg = APRConfig(dataset="IndoorDataset", kitti_root=fake_indoor)
    ds = make_dataset(cfg, "test")  # no augmentation at test
    assert len(ds) == 3
    pair = ds.get_pair(0)
    src, tgt, t = pair["points0"], pair["points1"], pair["t_gt"]
    # GT transform aligns src onto tgt exactly (no noise at test)
    warped = src @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(warped, tgt, atol=1e-4)


def test_indoor_augmentation_consistency(fake_indoor):
    cfg = APRConfig(dataset="IndoorDataset", kitti_root=fake_indoor)
    ds = make_dataset(cfg, "train")  # with rotation + noise augmentation
    pair = ds.get_pair(1)
    src, tgt, t = pair["points0"], pair["points1"], pair["t_gt"]
    warped = src @ t[:3, :3].T + t[:3, 3]
    # still aligned up to the injected uniform noise
    err = np.linalg.norm(warped - tgt, axis=1)
    assert np.median(err) < 0.02


@pytest.fixture(scope="module")
def fake_modelnet(tmp_path_factory):
    import h5py

    root = tmp_path_factory.mktemp("modelnet")
    rng = np.random.default_rng(0)
    with h5py.File(root / "ply_data_train0.h5", "w") as f:
        f["data"] = rng.uniform(-1, 1, (5, 2048, 3)).astype(np.float32)
        f["label"] = np.arange(5).reshape(-1, 1)
    return str(root)


def test_modelnet_dataset(fake_modelnet):
    cfg = APRConfig(dataset="ModelNetHdf", kitti_root=fake_modelnet)
    ds = make_dataset(cfg, "train")
    assert len(ds) == 5
    pair = ds.get_pair(2)
    src, tgt, t = pair["points0"], pair["points1"], pair["t_gt"]
    assert src.shape == (1024, 3) and tgt.shape == (1024, 3)
    # partial overlap: warped src should be close to tgt for many points
    warped = src @ t[:3, :3].T + t[:3, 3]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(tgt).query(warped, k=1)
    assert np.median(d) < 0.1  # same object, noise + partiality
    assert int(pair["label"]) == 2
