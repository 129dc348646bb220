"""Measure the EXECUTED reference's KPFCNN forward cost on this box's CPU.

Round-2 verdict weak-item 1: BENCH's ``vs_baseline`` denominator was an
*estimated* 0.5 pairs/s A100 pipeline.  The reference's Predator model stack
is pure torch, so the feature-extraction step (KPFCNN.forward on a stacked
pair, Predator_APR/models/architectures.py:137-212) can be MEASURED here and
scaled to an A100 bracket with a stated assumption, replacing the guess.

Protocol
- synthetic LiDAR-like pair at matched scale: ~18k voxelized (0.3 m) points
  per cloud (KITTI frames voxelize to ~15-20k), 4-level pyramid with the
  shipped kitti YAML radii (dl 0.3, conv_radius 4.25) and calibrated-like
  neighbor caps (40);
- pyramid tables built with scipy cKDTree (the reference builds them with
  nanoflann in DataLoader workers; table build is NOT timed — only the
  model forward, matching the reference's GPU-side cost);
- reference KPFCNN at the shipped kitti config (first_feats_dim 256,
  gnn_feats_dim 256, final_feats_dim 32, K=15), eval mode, float32;
- median of --iters forwards after one warmup.

Outputs one JSON line:
  {"sec_per_pair_forward_cpu": ..., "threads": ..., "n_points": [...]}

Scaling assumption (stated, not measured): an A100 runs this
gather-dominated KPConv workload 50-200x faster than ONE CPU core
(memory-bandwidth ratio ~8 GB/s/core vs 1.6 TB/s plus tensor-core matmuls;
the low end assumes gather-bound, the high end matmul-bound).  BASELINE.md
records the resulting bracket.

    python tools/measure_reference_baseline.py [--n 18000] [--iters 5]
"""

import argparse
import json
import os
import sys
import time
import types

REF = "/root/reference/Predator_APR"


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)


def build_cloud(seed, n_target):
    import numpy as np

    r = np.random.default_rng(seed)
    n_raw = n_target * 3
    radius = 60.0 * np.sqrt(r.uniform(0.02, 1.0, n_raw))
    theta = r.uniform(0, 2 * np.pi, n_raw)
    pts = np.stack([radius * np.cos(theta), radius * np.sin(theta),
                    r.normal(0, 1.2, n_raw)], 1).astype(np.float32)
    # voxel 0.3 barycenter subsample
    return grid_subsample(pts, 0.3)[:n_target]


def grid_subsample(pts, dl):
    import numpy as np

    keys = np.floor(pts / dl).astype(np.int64)
    _, inv = np.unique(keys, axis=0, return_inverse=True)
    k = inv.max() + 1
    out = np.zeros((k, 3), np.float64)
    cnt = np.zeros(k, np.int64)
    np.add.at(out, inv, pts)
    np.add.at(cnt, inv, 1)
    return (out / cnt[:, None]).astype(np.float32)


def radius_neighbors(q, s, r, cap):
    import numpy as np
    from scipy.spatial import cKDTree

    tree = cKDTree(s)
    d, idx = tree.query(q, k=cap, distance_upper_bound=r)
    # cKDTree pads misses with n; matches the shadow convention
    if cap == 1:
        d, idx = d[:, None], idx[:, None]
    return idx.astype(np.int64)


def build_batch(torch, n_points, levels=4, dl=0.3, conv_radius=4.25, cap=40):
    import numpy as np

    clouds = [build_cloud(s, n_points) for s in (0, 1)]
    per = []
    for pts in clouds:
        lv = []
        p, d = pts, dl
        for _ in range(levels):
            p = grid_subsample(p, d)
            lv.append(p)
            d *= 2
        per.append(lv)

    batch = {"points": [], "neighbors": [], "pools": [], "upsamples": [],
             "stack_lengths": []}
    r = dl * conv_radius
    for l in range(levels):
        a, b = per[0][l], per[1][l]
        na, nb = len(a), len(b)
        stacked = np.concatenate([a, b])
        batch["points"].append(torch.from_numpy(stacked))
        batch["stack_lengths"].append(torch.tensor([na, nb], dtype=torch.int32))

        def stack_tables(ta, tb, n_sa, n_sb, off):
            ta = ta.copy()
            ta[ta == n_sa] = n_sa + n_sb
            tb = tb.copy()
            v = tb != n_sb
            tb[v] += off
            tb[~v] = n_sa + n_sb
            return torch.from_numpy(np.concatenate([ta, tb]))

        nb_a = radius_neighbors(a, a, r, cap)
        nb_b = radius_neighbors(b, b, r, cap)
        batch["neighbors"].append(stack_tables(nb_a, nb_b, na, nb, na))
        if l + 1 < levels:
            a1, b1 = per[0][l + 1], per[1][l + 1]
            pa = radius_neighbors(a1, a, r, cap)
            pb = radius_neighbors(b1, b, r, cap)
            batch["pools"].append(stack_tables(pa, pb, na, nb, na))
            ua = radius_neighbors(a, a1, 1e9, 1)
            ub = radius_neighbors(b, b1, 1e9, 1)
            batch["upsamples"].append(
                stack_tables(ua, ub, len(a1), len(b1), len(a1)))
        else:
            batch["pools"].append(torch.zeros((1, 1), dtype=torch.int64))
            batch["upsamples"].append(torch.zeros((1, 1), dtype=torch.int64))
        r *= 2
    n0 = len(per[0][0]) + len(per[1][0])
    batch["features"] = torch.ones((n0, 1), dtype=torch.float32)
    return batch, [len(per[0][l]) + len(per[1][l]) for l in range(levels)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=18000)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import torch

    _stub("chamferdist")
    sys.modules["chamferdist"].ChamferDistance = object
    sys.path.insert(0, REF)
    import models.architectures as arch  # noqa: E402 (reference, executed)

    cfg = types.SimpleNamespace(
        architecture=[
            "simple", "resnetb",
            "resnetb_strided", "resnetb", "resnetb",
            "resnetb_strided", "resnetb", "resnetb",
            "resnetb_strided", "resnetb", "resnetb",
            "nearest_upsample", "unary", "nearest_upsample", "unary",
            "nearest_upsample", "last_unary",
        ],
        first_subsampling_dl=0.3, conv_radius=4.25, in_feats_dim=1,
        first_feats_dim=256, final_feats_dim=32, num_kernel_points=15,
        KP_extent=2.0, in_points_dim=3, fixed_kernel_points="center",
        KP_influence="linear", aggregation_mode="sum", modulated=False,
        use_batch_norm=True, batch_norm_momentum=0.02, deform_radius=5.0,
        gnn_feats_dim=256, dgcnn_k=10, num_head=4,
        nets=["self", "cross", "self"], condition_feature=True,
        add_cross_score=True, switch_to_decoder=False, symmetric=False,
        point_generation_ratio=4,
    )
    cwd = os.getcwd()
    os.chdir(REF)
    try:
        model = arch.KPFCNN(cfg)
    finally:
        os.chdir(cwd)
    model.eval()

    batch, sizes = build_batch(torch, args.n)
    times = []
    with torch.no_grad():
        model(batch)  # warmup
        for _ in range(args.iters):
            t0 = time.perf_counter()
            model(batch)
            times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "sec_per_pair_forward_cpu": round(med, 3),
        "threads": torch.get_num_threads(),
        "torch": torch.__version__,
        "stacked_points_per_level": sizes,
        "iters": args.iters,
        "all_times": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
