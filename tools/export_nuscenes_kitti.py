"""nuScenes -> KITTI-format converter.

Parity with the reference's resources/export_kitti_minimal.py:49-150: walks
every nuScenes log, writes per-frame LiDAR scans as KITTI-style velodyne
.bin files plus a per-sequence ``poses.npy`` holding the lidar->world 4x4 of
each frame, under ``{out_root}/{split}/sequences/{log_name}/``.

Requires the nuscenes-devkit (not bundled in this image); the import is
gated so the rest of the framework never depends on it.

    python tools/export_nuscenes_kitti.py --nusc_root /data/nuscenes \
        --out_root ./data/nuscenes --split train
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quaternion_matrix(w, x, y, z):
    """Rotation matrix from a unit quaternion (no external deps)."""
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n < 1e-12 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1 - (xx + yy)],
    ])


def pose_matrix(translation, rotation_wxyz):
    t = np.eye(4)
    t[:3, :3] = quaternion_matrix(*rotation_wxyz)
    t[:3, 3] = translation
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nusc_root", required=True)
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--version", default="v1.0-trainval")
    ap.add_argument("--split", default="train", choices=["train", "val", "test"])
    args = ap.parse_args()

    try:
        from nuscenes.nuscenes import NuScenes
        from nuscenes.utils.splits import create_splits_logs
    except ImportError as e:  # pragma: no cover - devkit not bundled
        raise SystemExit(
            "nuscenes-devkit is required for conversion; install it in an "
            "environment with network access and re-run"
        ) from e

    nusc = NuScenes(version=args.version, dataroot=args.nusc_root)
    split_logs = create_splits_logs(args.split, nusc)

    for scene in nusc.scene:
        log = nusc.get("log", scene["log_token"])
        if log["logfile"] not in split_logs:
            continue
        seq_dir = os.path.join(
            args.out_root, args.split, "sequences", scene["name"]
        )
        os.makedirs(os.path.join(seq_dir, "velodyne"), exist_ok=True)

        poses = []
        token = scene["first_sample_token"]
        frame = 0
        while token:
            sample = nusc.get("sample", token)
            sd = nusc.get("sample_data", sample["data"]["LIDAR_TOP"])
            # lidar -> world = ego_pose @ calibrated_sensor
            ego = nusc.get("ego_pose", sd["ego_pose_token"])
            cal = nusc.get("calibrated_sensor", sd["calibrated_sensor_token"])
            t_ego = pose_matrix(ego["translation"], ego["rotation"])
            t_cal = pose_matrix(cal["translation"], cal["rotation"])
            poses.append(t_ego @ t_cal)

            scan = np.fromfile(
                os.path.join(args.nusc_root, sd["filename"]), dtype=np.float32
            ).reshape(-1, 5)[:, :4]
            scan.astype(np.float32).tofile(
                os.path.join(seq_dir, "velodyne", "%06d.bin" % frame)
            )
            frame += 1
            token = sample["next"]

        np.save(os.path.join(seq_dir, "poses.npy"),
                np.asarray(poses, dtype=np.float64))
        print(f"{scene['name']}: {frame} frames")


if __name__ == "__main__":
    main()
