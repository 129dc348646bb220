"""EXECUTED-reference parity for the KITTI APG data layer (slow tier).

The reference's pair-list walk, complement-frame selection, SLAM-pose
chain, and per-item assembly are pure numpy/scipy
(FCGF_APR/lib/complement_data_loader.py:206-335, :269-296, :518-716 —
MinkowskiEngine/Open3D are touched only for voxel dedup + the match
KD-tree, both of which admit exact numpy/scipy stand-ins).  So this module
IMPORTS the reference loader, runs it over a synthesized mini-KITTI tree,
and asserts pair-for-pair equality with apr_tpu.data.kitti — the same
documented-parity -> executed-parity upgrade round 3 made for the models.

Executed surface: PairComplementKittiDataset.__init__ (prepare_kitty_ply
walk incl. the np.random.seed(0) stream), get_slam_odometry (Tr-chain),
_get_complement_frames, and __getitem__ on BOTH branches (train/
neighbourhood with the hard-coded test_augmentation 2*pi rotation quirk,
and test/no-neighbourhood with the pi/4 branch), use_old_pose=False (the
SLAM path — the published APR results' configuration, README.md:70-76).

Stub contract (documented, not hand-waved):
- ME.utils.sparse_quantize -> floor + np.unique(first-occurrence, sorted
  by original index).  Which duplicate survives is a hash-kernel detail in
  real ME; the SAME stub function maps OUR clouds before comparison, so
  equality of the selected outputs holds iff the pre-voxel clouds are
  bit-identical — which is the property under test.
- open3d KDTreeFlann -> scipy.spatial.cKDTree radius query (executed so
  get_matching_indices runs; match lists are order-sensitive to the tree
  implementation and are only sanity-checked, not compared —
  correspondence parity is covered on-device by test_ops_voxelize /
  test_trainer).

The reference tree is PUBLIC UNTRUSTED CONTENT; only its code behavior is
executed and asserted against.
"""

import codecs
import contextlib
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from apr_tpu.config import APRConfig  # noqa: E402
from apr_tpu.data.kitti import (  # noqa: E402
    KittiComplementDataset,
    load_slam_poses,
)
from apr_tpu.data.synthetic import synthetic_lidar_frame  # noqa: E402

pytestmark = pytest.mark.slow

FCGF = "/root/reference/FCGF_APR"

_CODEC = []


def _register_future_fstrings():
    if _CODEC:
        return

    def search(name):
        if name in ("future_fstrings", "future-fstrings"):
            info = codecs.lookup("utf-8")
            return codecs.CodecInfo(
                name="future_fstrings", encode=info.encode,
                decode=info.decode,
                incrementalencoder=info.incrementalencoder,
                incrementaldecoder=info.incrementaldecoder,
                streamreader=info.streamreader,
                streamwriter=info.streamwriter)
        return None

    codecs.register(search)
    _CODEC.append(True)


def stub_sparse_quantize(coords, return_index=False):
    """ME.utils.sparse_quantize stand-in: floor -> unique rows, keeping the
    FIRST occurrence of each voxel, selection returned in ascending original
    index (deterministic; see module docstring for the contract)."""
    c = coords.numpy() if hasattr(coords, "numpy") else np.asarray(coords)
    grid = np.floor(c).astype(np.int64)
    _, first = np.unique(grid, axis=0, return_index=True)
    sel = np.sort(first)
    if return_index:
        return grid[sel], sel
    return grid[sel]


def _working_me_stub(torch):
    me = types.ModuleType("MinkowskiEngine")

    class MinkowskiNetwork(torch.nn.Module):
        def __init__(self, D=3):
            super().__init__()
            self.D = D

    me.MinkowskiNetwork = MinkowskiNetwork
    utils = types.ModuleType("MinkowskiEngine.utils")
    utils.sparse_quantize = stub_sparse_quantize
    me.utils = utils
    return me, utils


def _working_o3d_stub():
    """Just enough open3d for make_open3d_point_cloud +
    get_matching_indices (util/pointcloud.py:9-14, :53-66)."""
    from scipy.spatial import cKDTree

    o3d = types.ModuleType("open3d")

    class Vector3dVector(list):
        def __init__(self, xyz):
            super().__init__(np.asarray(xyz, dtype=np.float64))

    class PointCloud:
        def __init__(self):
            self.points = Vector3dVector(np.zeros((0, 3)))

        def transform(self, t):
            pts = np.asarray(self.points)
            t = np.asarray(t)
            self.points = Vector3dVector(pts @ t[:3, :3].T + t[:3, 3])

    class KDTreeFlann:
        def __init__(self, pcd):
            self._tree = cKDTree(np.asarray(pcd.points))

        def search_radius_vector_3d(self, point, radius):
            idx = self._tree.query_ball_point(np.asarray(point), radius)
            return len(idx), list(idx), []

    geometry = types.ModuleType("open3d.geometry")
    geometry.PointCloud = PointCloud
    geometry.KDTreeFlann = KDTreeFlann
    utility = types.ModuleType("open3d.utility")
    utility.Vector3dVector = Vector3dVector
    pipelines = types.ModuleType("open3d.pipelines")
    pipelines.registration = types.ModuleType(
        "open3d.pipelines.registration")

    class _Feature:  # referenced by util.pointcloud at import time only
        pass

    pipelines.registration.Feature = _Feature
    o3d.geometry = geometry
    o3d.utility = utility
    o3d.pipelines = pipelines
    return o3d


@contextlib.contextmanager
def _isolated(*names):
    saved = {}
    for mod in list(sys.modules):
        if mod.split(".")[0] in names:
            saved[mod] = sys.modules.pop(mod)
    try:
        yield
    finally:
        for mod in list(sys.modules):
            if mod.split(".")[0] in names:
                del sys.modules[mod]
        sys.modules.update(saved)


class _RefCfg(dict):
    """The reference's easydict-style config (attribute + .items())."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v


N_FRAMES = 72
FRAME_PTS = 2500


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Mini KITTI tree at <base>/dataset (the reference appends '/dataset'
    to kitti_root, complement_data_loader.py:141): curvy trajectory, a
    NON-identity calib Tr so the SLAM Tr-chain (:269-296) is exercised."""
    from scipy.spatial.transform import Rotation

    base = tmp_path_factory.mktemp("kitti_ref")
    root = base / "dataset"
    seq = root / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)

    # a real-ish rigid Tr (rotation + offset), NOT identity
    tr = np.eye(4)
    tr[:3, :3] = Rotation.from_euler("zyx", [0.03, -1.55, 0.02]).as_matrix()
    tr[:3, 3] = [-0.01, -0.07, -0.27]
    with open(seq / "calib.txt", "w") as f:
        f.write("Tr: " + " ".join("%.9f" % v for v in tr[:3].reshape(-1))
                + "\n")

    # curvy trajectory: 2 m steps, slowly turning heading, mild pitch
    heading = 0.0
    pos = np.zeros(3)
    cam_poses = []
    tr_inv = np.linalg.inv(tr)
    for t in range(N_FRAMES):
        heading += 0.05 * np.sin(t / 9.0)
        step = np.array([np.cos(heading), np.sin(heading), 0.01 * np.sin(t / 5.0)])
        pos = pos + 2.0 * step
        lidar_pose = np.eye(4)
        lidar_pose[:3, :3] = Rotation.from_euler("z", heading).as_matrix()
        lidar_pose[:3, 3] = pos
        # poses.txt stores cam-frame poses; both loaders apply Tr^-1 P Tr
        cam = tr @ lidar_pose @ tr_inv
        cam_poses.append(cam[:3].reshape(-1))
        pts = synthetic_lidar_frame(seed=1000 + t, n_points=FRAME_PTS,
                                    extent=28.0)
        xyzr = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], axis=1)
        xyzr.astype(np.float32).tofile(seq / "velodyne" / ("%06d.bin" % t))
    with open(seq / "poses.txt", "w") as f:
        for p in cam_poses:
            f.write(" ".join("%.12f" % v for v in p) + "\n")

    # split files for the reference's DATA_FILES indirection
    for phase in ("train", "test"):
        with open(base / f"{phase}_split.txt", "w") as f:
            f.write("00\n")
    return base


def _ref_cfg(base, phase):
    return _RefCfg(
        kitti_root=str(base),
        voxel_size=0.3,
        positive_pair_search_voxel_size_multiplier=1.5,
        min_scale=0.8,
        max_scale=1.2,
        rotation_range=360,
        use_old_pose=False,
        pair_min_dist=5.0,
        pair_max_dist=10.0,
        min_sample_frame_dist=50.0,
        complement_pair_dist=4.0,
        num_complement_one_side=2,
        mutate_neighbour_percentage=0.0,
        test_augmentation=True,  # overwritten to True by __init__ anyway
        LoKITTI=False,
        downsample_single=1.0,
    )


def _our_cfg(base):
    return APRConfig(
        kitti_root=os.path.join(str(base), "dataset"),
        voxel_size=0.3,
        positive_pair_search_voxel_size_multiplier=1.5,
        pair_min_dist=5.0,
        pair_max_dist=10.0,
        complement_pair_dist=4.0,
        num_complement_one_side=2,
        use_old_pose=False,
        random_rotation=True,
        random_scale=False,
        mutate_neighbour_percentage=0.0,
        downsample_single=1.0,
        seed=0,
    )


@pytest.fixture(scope="module")
def ref_datasets(kitti_tree):
    """Import + construct the reference loader for train AND test phases
    with executable ME/o3d stubs installed; returns the live instances
    (their module globals keep the stub bindings after isolation exits)."""
    torch = pytest.importorskip("torch")
    _register_future_fstrings()
    me, me_utils = _working_me_stub(torch)
    o3d = _working_o3d_stub()

    with _isolated("lib", "util", "model", "MinkowskiEngine", "open3d"):
        sys.modules["MinkowskiEngine"] = me
        sys.modules["MinkowskiEngine.utils"] = me_utils
        sys.modules["open3d"] = o3d
        sys.modules["open3d.geometry"] = o3d.geometry
        sys.modules["open3d.utility"] = o3d.utility
        sys.path.insert(0, FCGF)
        try:
            import lib.complement_data_loader as cdl

            cdl.PairComplementKittiDataset.DATA_FILES = {
                "train": str(kitti_tree / "train_split.txt"),
                "val": str(kitti_tree / "train_split.txt"),
                "test": str(kitti_tree / "test_split.txt"),
            }
            ds_train = cdl.PairComplementKittiDataset(
                "train", transform=None, random_rotation=True,
                random_scale=False, manual_seed=True,
                config=_ref_cfg(kitti_tree, "train"))
            ds_test = cdl.PairComplementKittiDataset(
                "test", transform=None, random_rotation=True,
                random_scale=False, manual_seed=True,
                config=_ref_cfg(kitti_tree, "test"))
            yield dict(train=ds_train, test=ds_test, module=cdl)
        finally:
            sys.path.remove(FCGF)


@pytest.fixture(scope="module")
def our_datasets(kitti_tree):
    cfg = _our_cfg(kitti_tree)
    return dict(
        train=KittiComplementDataset(cfg, "train", splits={"train": [0]}),
        test=KittiComplementDataset(
            cfg.replace(random_rotation=True), "test", splits={"test": [0]}),
    )


# ---------------------------------------------------------------------------
# walk + pose-chain parity
# ---------------------------------------------------------------------------

def test_train_walk_pair_for_pair(ref_datasets, our_datasets):
    """prepare_kitty_ply (:206-250) vs generate_pairs: identical pair list
    including complement frame ids and the seed-0 target-distance stream."""
    ref = ref_datasets["train"].files
    ours = our_datasets["train"].files
    assert len(ref) > 3  # the walk actually produced pairs
    assert len(ref) == len(ours)
    for rf, of in zip(ref, ours):
        r_drive, r_t0, r_t1, r_c0, r_c1 = rf
        o_drive, o_t0, o_t1, o_c0, o_c1 = of
        assert (r_drive, r_t0, r_t1) == (o_drive, o_t0, o_t1)
        assert list(r_c0) == list(o_c0)
        assert list(r_c1) == list(o_c1)


def test_test_walk_pair_for_pair(ref_datasets, our_datasets):
    ref = ref_datasets["test"].files
    ours = our_datasets["test"].files
    assert len(ref) > 3
    assert [tuple(f) for f in ref] == [tuple(f[:3]) for f in ours]


def test_slam_pose_chain(ref_datasets, kitti_tree):
    """get_slam_odometry's Tr^-1 @ P @ Tr chain (:269-296) vs ours —
    same parse, same matrix products, non-identity Tr."""
    ref_poses = ref_datasets["train"].get_slam_odometry(0, return_all=True)
    ours = load_slam_poses(
        os.path.join(str(kitti_tree), "dataset", "sequences", "00"))
    assert ref_poses.shape == ours.shape == (N_FRAMES, 4, 4)
    np.testing.assert_array_equal(np.asarray(ref_poses), ours)


def test_complement_frame_selection_executed(ref_datasets, our_datasets):
    """_get_complement_frames (:298-335) executed on the reference against
    find_complement_frames on the same trajectory, all frames."""
    from apr_tpu.data.kitti import find_complement_frames

    ref_ds = ref_datasets["train"]
    ts = ref_ds.Ts  # set by prepare_kitty_ply
    for frame in range(5, N_FRAMES - 5, 3):
        r_skip, r_cmpl = ref_ds._get_complement_frames(frame)
        o_skip, o_cmpl = find_complement_frames(
            ts, frame, complement_pair_dist=4.0, num_one_side=2,
            complement_range=8.0)
        assert r_skip == o_skip
        assert list(r_cmpl) == list(o_cmpl)


# ---------------------------------------------------------------------------
# __getitem__ parity (SLAM branch) — both phases
# ---------------------------------------------------------------------------

def _voxel_select(xyz, voxel_size):
    _, sel = stub_sparse_quantize(xyz / voxel_size, return_index=True)
    return xyz[sel]


def test_train_items_bitwise(ref_datasets, our_datasets):
    """First 4 train items: the randg-seed-0 rotation stream, APC
    assembly + crop, and GT must match the executed reference bit-for-bit
    (clouds) / to fp32 (the float64->float32 GT cast)."""
    ref_ds = ref_datasets["train"]
    our_ds = our_datasets["train"]
    n = min(4, len(ref_ds))
    for idx in range(n):
        (xyz0_t, xyz1_t, nghb0_t, nghb1_t, coords0, coords1,
         feats0, feats1, matches, trans) = ref_ds[idx]
        ours = our_ds.get_pair(idx)

        np.testing.assert_allclose(
            np.asarray(trans, np.float32), ours["t_gt"], atol=2e-5,
            rtol=1e-6)

        # reference returns voxel-SELECTED clouds; map ours through the
        # same quantizer — equal selections iff pre-voxel clouds are equal
        for ref_cloud, our_cloud in (
                (xyz0_t, ours["points0"]), (xyz1_t, ours["points1"]),
                (nghb0_t, ours["apc0"]), (nghb1_t, ours["apc1"])):
            r = np.asarray(ref_cloud)
            o = _voxel_select(our_cloud, 0.3)
            assert r.shape == o.shape, (idx, r.shape, o.shape)
            np.testing.assert_array_equal(r, o)

        # executed-but-not-compared surfaces stay sane
        assert len(matches) > 0
        assert np.asarray(coords0).shape[0] == np.asarray(xyz0_t).shape[0]
        assert float(np.asarray(feats0).min()) == 1.0


def test_test_items_bitwise(ref_datasets, our_datasets):
    """Test branch (:717-816): pi/4 rotation gate, no APC, voxel-selected
    pair clouds + GT parity."""
    ref_ds = ref_datasets["test"]
    our_ds = our_datasets["test"]
    n = min(4, len(ref_ds))
    for idx in range(n):
        (xyz0_t, xyz1_t, coords0, coords1, feats0, feats1, matches,
         trans) = ref_ds[idx]
        ours = our_ds.get_pair(idx)
        assert ours["apc0"].shape[0] == 0
        np.testing.assert_allclose(
            np.asarray(trans, np.float32), ours["t_gt"], atol=2e-5,
            rtol=1e-6)
        for ref_cloud, our_cloud in (
                (xyz0_t, ours["points0"]), (xyz1_t, ours["points1"])):
            r = np.asarray(ref_cloud)
            o = _voxel_select(our_cloud, 0.3)
            assert r.shape == o.shape, (idx, r.shape, o.shape)
            np.testing.assert_array_equal(r, o)


# ---------------------------------------------------------------------------
# Executed-reference parity: the BASELINE (non-APG) walks + item assembly
# (FCGF_APR/lib/data_loaders.py KITTI{,NM,RandDist}PairDataset)
# ---------------------------------------------------------------------------

def _o3d_with_icp_stub():
    """The data-loader ICP call is stubbed to identity refinement, so the
    executed GT equals the velo2cam odometry chain — exactly what our
    baseline returns with no ICP cache; the real refinement is produced
    offline by tools/prepare_icp_cache.py on both sides."""
    o3d = _working_o3d_stub()
    reg = o3d.pipelines.registration

    class _Result:
        transformation = np.eye(4)

    reg.registration_icp = lambda *a, **k: _Result()
    reg.TransformationEstimationPointToPoint = lambda *a, **k: None
    reg.ICPConvergenceCriteria = lambda *a, **k: None
    return o3d


@pytest.fixture(scope="module")
def kitti_tree_odo(kitti_tree):
    """Add the odometry-pose layout (<root>/dataset/poses/00.txt) the
    baseline loaders read (data_loaders.py:356-357)."""
    root = kitti_tree / "dataset"
    poses_dir = root / "poses"
    poses_dir.mkdir(exist_ok=True)
    seq = root / "sequences" / "00"
    lines = open(seq / "poses.txt").read().strip().splitlines()
    with open(poses_dir / "00.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return kitti_tree


@pytest.fixture(scope="module")
def ref_baselines(kitti_tree_odo):
    torch = pytest.importorskip("torch")
    _register_future_fstrings()
    me, me_utils = _working_me_stub(torch)
    o3d = _o3d_with_icp_stub()

    with _isolated("lib", "util", "model", "MinkowskiEngine", "open3d"):
        sys.modules["MinkowskiEngine"] = me
        sys.modules["MinkowskiEngine.utils"] = me_utils
        sys.modules["open3d"] = o3d
        sys.modules["open3d.geometry"] = o3d.geometry
        sys.modules["open3d.utility"] = o3d.utility
        sys.path.insert(0, FCGF)
        try:
            import lib.data_loaders as dl

            files = {
                "train": str(kitti_tree_odo / "train_split.txt"),
                "val": str(kitti_tree_odo / "train_split.txt"),
                "test": str(kitti_tree_odo / "test_split.txt"),
            }
            for cls in (dl.KITTIPairDataset, dl.KITTINMPairDataset,
                        dl.KITTIRandDistPairDataset):
                cls.DATA_FILES = files
            cfg = _RefCfg(
                kitti_root=str(kitti_tree_odo),
                voxel_size=0.3,
                positive_pair_search_voxel_size_multiplier=1.5,
                min_scale=0.8, max_scale=1.2, rotation_range=360,
                kitti_max_time_diff=4,
            )
            td = dl.KITTIPairDataset("train", random_scale=False,
                                     manual_seed=True, config=cfg)
            nm = dl.KITTINMPairDataset("train", random_scale=False,
                                       manual_seed=True, config=cfg)
            np.random.seed(0)  # the RandDist walk consumes GLOBAL np.random
            rd = dl.KITTIRandDistPairDataset("train", random_scale=False,
                                             manual_seed=True, config=cfg)
            yield dict(time_diff=td, nm=nm, rand_dist=rd)
        finally:
            sys.path.remove(FCGF)


def _our_baseline(kitti_tree, mode):
    from apr_tpu.data.kitti import KittiBaselinePairDataset

    cfg = _our_cfg(kitti_tree).replace(kitti_max_time_diff=4,
                                       random_rotation=True)
    return KittiBaselinePairDataset(cfg, "train", mode,
                                    splits={"train": [0]})


def test_baseline_walks_executed(ref_baselines, kitti_tree_odo):
    ours_td = _our_baseline(kitti_tree_odo, "time_diff")
    # time_diff iterates glob order (unsorted) in the reference — compare
    # as multisets
    assert sorted(map(tuple, ref_baselines["time_diff"].files)) \
        == sorted(map(tuple, ours_td.files))
    assert len(ours_td.files) > 50

    ours_nm = _our_baseline(kitti_tree_odo, "nm")
    assert [tuple(map(int, f)) for f in ref_baselines["nm"].files] \
        == [tuple(map(int, f)) for f in ours_nm.files]
    assert len(ours_nm.files) > 3

    ours_rd = _our_baseline(kitti_tree_odo, "rand_dist")
    assert [tuple(map(int, f)) for f in ref_baselines["rand_dist"].files] \
        == [tuple(map(int, f)) for f in ours_rd.files]
    assert len(ours_rd.files) > 3


def test_baseline_items_bitwise(ref_baselines, kitti_tree_odo):
    """NM items: baselines NEVER rotate (TEST_RANDOM_ROTATION override at
    every phase, data_loaders.py:302-305) and with identity-stubbed ICP
    the GT is the raw velo2cam odometry chain — both must match ours
    bit-for-bit after the shared voxel map."""
    ref_ds = ref_baselines["nm"]
    our_ds = _our_baseline(kitti_tree_odo, "nm")
    n = min(3, len(ref_ds))
    for idx in range(n):
        (xyz0_t, xyz1_t, coords0, coords1, feats0, feats1, matches,
         trans) = ref_ds[idx]
        ours = our_ds.get_pair(idx)
        np.testing.assert_allclose(np.asarray(trans, np.float32),
                                   ours["t_gt"], atol=2e-5, rtol=1e-6)
        for ref_cloud, our_cloud in ((xyz0_t, ours["points0"]),
                                     (xyz1_t, ours["points1"])):
            r = np.asarray(ref_cloud)
            o = _voxel_select(our_cloud, 0.3)
            assert r.shape == o.shape, (idx, r.shape, o.shape)
            np.testing.assert_array_equal(r, o)


# ---------------------------------------------------------------------------
# Executed-reference parity: the nuScenes complement WALK
# (PairComplementNuscenesDataset, complement_data_loader.py:825-930)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def nuscenes_tree(tmp_path_factory):
    """Mini converted-nuScenes tree: {root}/{phase}/sequences/<log>/
    velodyne/*.bin + poses.npy (lidar->world 4x4 per frame)."""
    from scipy.spatial.transform import Rotation

    base = tmp_path_factory.mktemp("nusc_ref")
    seq = base / "train" / "sequences" / "log-0042"
    (seq / "velodyne").mkdir(parents=True)
    heading, pos = 0.0, np.zeros(3)
    poses = []
    for t in range(140):
        heading += 0.04 * np.cos(t / 7.0)
        pos = pos + 2.0 * np.array(
            [np.cos(heading), np.sin(heading), 0.0])
        p = np.eye(4)
        p[:3, :3] = Rotation.from_euler("z", heading).as_matrix()
        p[:3, 3] = pos
        poses.append(p)
        pts = synthetic_lidar_frame(seed=5000 + t, n_points=1500,
                                    extent=25.0)
        xyzr = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], axis=1)
        xyzr.astype(np.float32).tofile(seq / "velodyne" / ("%06d.bin" % t))
    np.save(seq / "poses.npy", np.asarray(poses))
    return base


def test_nuscenes_walk_executed(nuscenes_tree):
    """Reference nuScenes walk (same seed-0 stream + complement selection
    as KITTI, minus the discard list, plus the [::3][:1200] train slice)
    vs NuscenesComplementDataset — pair-for-pair."""
    torch = pytest.importorskip("torch")
    _register_future_fstrings()
    me, me_utils = _working_me_stub(torch)
    o3d = _working_o3d_stub()

    with _isolated("lib", "util", "model", "MinkowskiEngine", "open3d"):
        sys.modules["MinkowskiEngine"] = me
        sys.modules["MinkowskiEngine.utils"] = me_utils
        sys.modules["open3d"] = o3d
        sys.modules["open3d.geometry"] = o3d.geometry
        sys.modules["open3d.utility"] = o3d.utility
        sys.path.insert(0, FCGF)
        try:
            import lib.complement_data_loader as cdl

            cfg = _RefCfg(
                kitti_root=str(nuscenes_tree),
                voxel_size=0.3,
                positive_pair_search_voxel_size_multiplier=1.5,
                min_scale=0.8, max_scale=1.2, rotation_range=360,
                use_old_pose=True,  # asserted True by the loader
                pair_min_dist=5.0, pair_max_dist=10.0,
                min_sample_frame_dist=50.0,
                complement_pair_dist=4.0, num_complement_one_side=2,
                mutate_neighbour_percentage=0.0,
                test_augmentation=True, LoNUSCENES=False,
                downsample_single=1.0,
            )
            ref = cdl.PairComplementNuscenesDataset(
                "train", transform=None, random_rotation=True,
                random_scale=False, manual_seed=True, config=cfg)
            ref_files = list(ref.files)
        finally:
            sys.path.remove(FCGF)

    from apr_tpu.data.nuscenes import NuscenesComplementDataset

    ours = NuscenesComplementDataset(
        _our_cfg(nuscenes_tree).replace(  # kitti_root already points at base
            kitti_root=str(nuscenes_tree)),
        "train")
    assert len(ref_files) > 5
    assert len(ref_files) == len(ours.files)
    for rf, of in zip(ref_files, ours.files):
        assert str(rf[0]) == str(of[0])
        assert (int(rf[1]), int(rf[2])) == (int(of[1]), int(of[2]))
        assert list(rf[3]) == list(of[3])
        assert list(rf[4]) == list(of[4])
