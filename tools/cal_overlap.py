"""Pairwise fragment overlap-ratio computation (offline tool).

Parity with Predator_APR/scripts/cal_overlap.py:31-73: for every fragment
pair of a scene, the overlap ratio = fraction of points in cloud A with a
neighbor in cloud B within ``voxel_size`` after alignment, computed
symmetrically (min of both directions like the reference's usage).

    python tools/cal_overlap.py --dir ./fragments --voxel 0.0625
"""

import argparse
import glob
import os
import sys

import numpy as np
from scipy.spatial import cKDTree

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute_overlap_ratio(pcd0: np.ndarray, pcd1: np.ndarray,
                          voxel_size: float) -> float:
    """Reference compute_overlap_ratio parity (FCGF_APR/util/pointcloud.py)."""
    tree1 = cKDTree(pcd1)
    d0, _ = tree1.query(pcd0, k=1, distance_upper_bound=voxel_size)
    tree0 = cKDTree(pcd0)
    d1, _ = tree0.query(pcd1, k=1, distance_upper_bound=voxel_size)
    m0 = np.isfinite(d0).mean()
    m1 = np.isfinite(d1).mean()
    return float(min(m0, m1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True,
                    help="directory of .npy fragment point clouds")
    ap.add_argument("--voxel", type=float, default=0.0625)
    ap.add_argument("--out", default="overlaps.txt")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, "*.npy")))
    clouds = [np.load(f) for f in files]
    with open(args.out, "w") as f:
        for i in range(len(clouds)):
            for j in range(i + 1, len(clouds)):
                ratio = compute_overlap_ratio(clouds[i], clouds[j], args.voxel)
                f.write(f"{os.path.basename(files[i])} "
                        f"{os.path.basename(files[j])} {ratio:.6f}\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
