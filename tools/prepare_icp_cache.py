"""Offline GT preparation: populate the ICP transform cache.

The reference hides an expensive preprocessing stage inside the first
training epoch (SURVEY.md §3.5): each pair's first __getitem__ runs ICP /
multiway pose-graph registration and writes
``{kitti_root}/icp[_slam]/{drive}_{t_src}_{t_key}.npy``.  This tool runs that
stage explicitly, writing the exact same cache layout (so caches produced by
either implementation interoperate).

Only needed for ``use_old_pose=True`` (KITTI odometry poses); the SLAM-pose
path (APR's KITTI default) is pure matrix math and needs no cache.

    python tools/prepare_icp_cache.py --kitti_root ./data/kitti \
        --phase train --use_old_pose true
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kitti_root", required=True)
    ap.add_argument("--phase", default="train",
                    choices=["train", "val", "test"])
    ap.add_argument("--pair_min_dist", type=float, default=5.0)
    ap.add_argument("--pair_max_dist", type=float, default=20.0)
    ap.add_argument("--complement_pair_dist", type=float, default=10.0)
    ap.add_argument("--num_complement_one_side", type=int, default=3)
    ap.add_argument("--icp_voxel_size", type=float, default=0.05)
    ap.add_argument("--pairwise", action="store_true",
                    help="per-complement pairwise ICP instead of multiway "
                         "pose-graph registration (the reference's "
                         "debug_use_old_complement path, "
                         "complement_data_loader.py:566-570)")
    args = ap.parse_args()

    from apr_tpu.config import APRConfig
    from apr_tpu.data.kitti import KittiComplementDataset, velo2cam_matrix
    from apr_tpu.data.multiway import multiway_complement_transforms
    from apr_tpu.geometry.icp import registration_icp

    cfg = APRConfig(
        kitti_root=args.kitti_root,
        use_old_pose=True,
        pair_min_dist=args.pair_min_dist,
        pair_max_dist=args.pair_max_dist,
        complement_pair_dist=args.complement_pair_dist,
        num_complement_one_side=args.num_complement_one_side,
    )
    ds = KittiComplementDataset(cfg, args.phase)
    os.makedirs(ds.icp_path, exist_ok=True)
    v2c = velo2cam_matrix()

    def odo_init(pos_src, pos_tgt):
        # velo2cam chain (complement_data_loader.py:379-380)
        return (v2c @ pos_src.T @ np.linalg.inv(pos_tgt.T)
                @ np.linalg.inv(v2c)).T

    n_done = 0
    for entry in ds.files:
        if ds.load_neighbourhood:
            drive, t0, t1, cmpl0, cmpl1 = entry
        else:
            drive, t0, t1 = entry[:3]
            cmpl0 = cmpl1 = []
        poses = ds._get_poses(drive)

        # pair GT: odometry init + ICP refine (reference _get_icp)
        key = "%d_%d_%d" % (drive, t0, t1)
        fn = os.path.join(ds.icp_path, key + ".npy")
        if not os.path.exists(fn):
            xyz1 = ds._get_xyz(drive, t1)
            xyz0 = ds._get_xyz(drive, t0)
            m_init = odo_init(poses[t0], poses[t1])
            from apr_tpu.data.multiway import _voxel_dedup

            reg = registration_icp(
                _voxel_dedup(xyz0, args.icp_voxel_size),
                _voxel_dedup(xyz1, args.icp_voxel_size),
                0.2, m_init, max_iteration=200,
            )
            np.save(fn, reg.transformation)
            n_done += 1

        # complement transforms via multiway registration
        for t_key, t_cmpls in ((t0, cmpl0), (t1, cmpl1)):
            if not t_cmpls:
                continue
            missing = [
                t_c for t_c in t_cmpls
                if not os.path.exists(os.path.join(
                    ds.icp_path, "%d_%d_%d.npy" % (drive, t_c, t_key)))
            ]
            if not missing:
                continue
            xyz_key = ds._get_xyz(drive, t_key)
            xyz_cmpls = [ds._get_xyz(drive, t) for t in t_cmpls]
            inits = [odo_init(poses[t], poses[t_key]) for t in t_cmpls]
            if args.pairwise:
                # old method: ICP each complement onto the key frame
                # (_get_neighbourhood_icp parity)
                from apr_tpu.data.multiway import _voxel_dedup

                key_ds_pts = _voxel_dedup(xyz_key, args.icp_voxel_size)
                ms = []
                for x, init in zip(xyz_cmpls, inits):
                    reg = registration_icp(
                        _voxel_dedup(x, args.icp_voxel_size), key_ds_pts,
                        0.2, init, max_iteration=200,
                    )
                    ms.append(reg.transformation)
            else:
                ms = multiway_complement_transforms(
                    xyz_key, xyz_cmpls, inits,
                    cfg.num_complement_one_side, args.icp_voxel_size,
                )
            for t_c, m in zip(t_cmpls, ms):
                np.save(os.path.join(
                    ds.icp_path, "%d_%d_%d.npy" % (drive, t_c, t_key)), m)
                n_done += 1
    print(f"wrote {n_done} cache entries to {ds.icp_path}")


if __name__ == "__main__":
    main()
