"""Typed configuration for the whole framework.

One dataclass replaces the reference's two config systems — FCGF's ~60-flag
argparse namespace (FCGF_APR/config.py:17-145) and Predator's flattened-YAML
EasyDict god-object (Predator_APR/lib/utils.py:46-65, main.py:52-114).  Field
names keep the reference spelling so shell scripts / YAML files translate
1:1; YAML and CLI overlays layer onto the same dataclass (no mutation of the
config into a carry-all).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class APRConfig:
    # --- trainer ---
    trainer: str = "GenerativePairTrainer"
    batch_size: int = 4
    val_batch_size: int = 1
    iter_size: int = 1
    max_epoch: int = 200
    stat_freq: int = 40
    val_epoch_freq: int = 1
    best_val_metric: str = "feat_match_ratio"
    seed: int = 0

    # --- model (FCGF path) ---
    model: str = "ResUNetFatBN"
    model_n_out: int = 128
    conv1_kernel_size: int = 5
    normalize_feature: bool = True
    bn_momentum: float = 0.05
    generator_model: str = "GenerativeMLP_98"
    point_generation_ratio: int = 4
    symmetric: bool = False

    # --- contrastive loss ---
    num_pos_per_batch: int = 1024
    num_hn_samples_per_batch: int = 256
    pos_thresh: float = 0.1
    neg_thresh: float = 1.4
    neg_weight: float = 1.0
    hit_ratio_thresh: float = 0.3

    # --- generative loss ---
    loss_ratio: float = 2e-3
    regularization_strength: float = 0.01
    regularization_type: str = "L2"
    alpha: float = 1.0
    # chamfer backend:
    #   "window" (default) = cell-key-sorted contiguous-window NN
    #     (ops/chamfer_window.py) — 2.6x faster than exact at KITTI scale,
    #     embeds cleanly in the differentiated train step; strays beyond
    #     2 * (chamfer_cell_multiplier * voxel_size) get a clamped
    #     zero-gradient contribution;
    #   "exact" = streaming brute force (ops/chamfer.py), the eval-grade
    #     reference semantics, VPU speed-of-light but O(Nq*Ns);
    #   "pallas" = brute force as a Pallas kernel (slower than "exact"'s
    #     XLA lowering on v5e — kept for kernel parity tests).
    # (A former "grid" 27-cell bucketed mode was deleted in round 3: its
    # searchsorted+gather chain miscompiled inside the differentiated step
    # on TPU and "window" supersedes it in both speed and robustness.)
    chamfer_mode: str = "window"
    chamfer_cell_multiplier: float = 4.0   # cell = multiplier * voxel_size

    # --- KPConv / Predator path (YAML field names preserved) ---
    num_layers: int = 4
    in_feats_dim: int = 1
    first_feats_dim: int = 256
    final_feats_dim: int = 32
    first_subsampling_dl: float = 0.3
    conv_radius: float = 4.25
    deform_radius: float = 5.0
    deformable: bool = False      # deformable KPConv in resnet blocks
    modulated: bool = False       # sigmoid-gated kernel points (deformable)
    num_kernel_points: int = 15
    KP_extent: float = 2.0
    KP_influence: str = "linear"
    aggregation_mode: str = "sum"
    fixed_kernel_points: str = "center"
    use_batch_norm: bool = True
    batch_norm_momentum: float = 0.02
    condition_feature: bool = True
    add_cross_score: bool = True
    gnn_feats_dim: int = 256
    dgcnn_k: int = 10
    num_head: int = 4
    nets: Tuple[str, ...] = ("self", "cross", "self")
    architecture: str = "kitti"
    neighborhood_limits: Tuple[int, ...] = (40, 40, 40, 40)
    # False -> run calibrate_neighbors on the train set before training and
    # overwrite neighborhood_limits (reference Predator_APR/main.py:94-111);
    # True -> keep the configured limits as-is
    neighborhood_limits_pinned: bool = True
    kp_capacities: Tuple[int, ...] = (16384, 4096, 2048, 1024)

    # --- Predator MetricLoss ---
    pos_margin: float = 0.1
    neg_margin: float = 1.4
    log_scale: float = 48.0
    pos_radius: float = 0.21
    safe_radius: float = 0.75
    overlap_radius: float = 0.45
    matchability_radius: float = 0.3
    max_points: int = 512
    w_circle_loss: float = 1.0
    w_overlap_loss: float = 1.0
    w_saliency_loss: float = 0.0
    corr_capacity: int = 8192

    # --- optimizer ---
    optimizer: str = "SGD"
    lr: float = 1e-1
    sgd_momentum: float = 0.9
    weight_decay: float = 1e-4
    exp_gamma: float = 0.99

    # --- data / APG ---
    dataset: str = "PairComplementKittiDataset"
    kitti_root: str = "./data/kitti"
    kitti_max_time_diff: int = 3  # baseline KITTIPairDataset dt range
    voxel_size: float = 0.3
    pair_min_dist: float = 5.0
    pair_max_dist: float = 20.0
    complement_pair_dist: float = 10.0
    num_complement_one_side: int = 3
    use_old_pose: bool = False
    min_scale: float = 0.8
    max_scale: float = 1.2
    rotation_range: float = 360.0
    random_scale: bool = True
    random_rotation: bool = True
    mutate_neighbour_percentage: float = 0.0
    # Predator-flavor D3Feat augmentation (Predator_APR/datasets/
    # kitti.py:494-517): per-cloud noise + one-sided rotation + scale +
    # per-cloud shift, replacing the FCGF-style rotation/scale when true
    d3feat_augmentation: bool = False
    augment_noise: float = 0.01
    augment_shift_range: float = 2.0
    LoKITTI: bool = False
    LoNUSCENES: bool = False
    downsample_single: float = 1.0
    positive_pair_search_voxel_size_multiplier: float = 1.5

    # conv compute dtype: "bfloat16" runs encoder matmuls/gathers in bf16
    # with f32 accumulation + f32 master params (reference trains fp32 on
    # CUDA; bf16 is the TPU-native mixed-precision recipe — ~4x MXU rate)
    compute_dtype: str = "bfloat16"

    # window top-k strategy for the KP radius tables ("topk", "tournament",
    # "itermin" — ops/neighbors.py _SELECTORS; all exact, chosen by the
    # measured selector study in docs/PERF.md)
    kp_radius_select: str = "topk"

    # --- static capacities (TPU buffers; no reference analog) ---
    point_capacity: int = 131072          # raw points per cloud
    capacities: Tuple[int, ...] = (16384, 8192, 4096, 2048)
    apc_capacity: int = 65536             # aggregated point cloud target
    corr_capacity_per_point: int = 1      # GT matches kept per source point

    # --- eval ---
    test_num_ransac_hypotheses: int = 32768
    test_ransac_dist_thresh: Optional[float] = None  # default: voxel_size
    # confidence-style escalation (analog of Open3D's adaptive criteria,
    # FCGF_APR/scripts/test_apr.py:150-155): when the best hypothesis has
    # < min_inliers inliers, re-run with factor x more hypotheses in-program.
    # Library default OFF: escalation fires precisely when inliers are
    # scarce, so with untrained/garbage features it triggers on EVERY pair
    # and multiplies eval cost 8x (measured: bench with random weights
    # drops 14.2 -> 7.4 pairs/s).  The reference-parity eval entry points
    # (scripts/test_apr.py, scripts/test_fcgf.py) turn it on, mirroring
    # Open3D's adaptive criteria which the hard-end sweep shows it
    # matches where it matters (docs/PERF.md, tools/sweep_ransac.py:
    # fixed-32k loses the 3-8% inlier band; escalation recovers it).
    # None = "unset" (library treats as 0/off; the parity eval entries
    # default it to 8); an explicit 0 pinned in config.json stays off.
    test_ransac_escalation_factor: Optional[int] = None
    test_ransac_escalation_min_inliers: int = 30
    # extra lax.cond stages (each factor x num_hypotheses) and the Open3D
    # confidence trigger (0 = legacy min-inliers trigger only); see
    # registration/ransac.py docstring + docs/PERF.md hard-end sweep
    test_ransac_escalation_rungs: int = 1
    test_ransac_escalation_confidence: float = 0.0
    test_subsample: int = 5000
    # occupancy-driven capacity bucketing (eval/bucketing.py): number of
    # halving tiers below the worst-case capacities the tester may select
    # per pair (0 = off, always worst-case; 2 allows /2 and /4 tiers).
    # Each tier is one extra compiled program, jit-cached after its first
    # pair; recall-neutral while no level overflows (test_bucketing.py).
    # None = "unset" (library treats as off; the parity eval entries
    # default it to 2 — measured 1.7-2.2x on under-full clouds,
    # docs/PERF.md); an explicit 0 pinned in config.json stays off.
    test_capacity_buckets: Optional[int] = None
    # train-time analog (data/pipeline.py): the loader groups each epoch's
    # pairs into capacity tiers so light batches train in shrunken buffers
    # (one extra train-step compile per tier, jit-cached).  Off by
    # default; ignored under fused_build / mesh_n_builders (those carry a
    # single static batch shape through their fused/split programs)
    train_capacity_buckets: int = 0
    rte_thresh: float = 2.0
    rre_thresh: float = 5.0

    # --- io ---
    out_dir: str = "./outputs"
    resume: Optional[str] = None
    weights: Optional[str] = None
    # jax.profiler trace capture: when set, steps [profile_start,
    # profile_start + profile_steps) of epoch 0 are traced into this dir
    # (view with tensorboard / xprof).  Replaces the reference's wall-clock
    # Timer instrumentation (SURVEY.md §5.1) with real device profiles.
    profile_dir: Optional[str] = None
    profile_start: int = 5
    profile_steps: int = 3

    # --- parallel ---
    num_devices: Optional[int] = None  # default: all
    # fold batch i+1's device-side build (voxelize/pyramids/correspondences)
    # into batch i's train-step program: one executable per iteration, no
    # inter-program dispatch gap (the reference hides ALL prep in DataLoader
    # workers — complement_data_loader.py:1375; dataloader.py:76).
    # Default OFF: measured ~4% SLOWER than queued separate build/step
    # programs at flagship shape (653.0 vs 627.9 ms/iter — a TPU core runs
    # ops serially either way, and the merged program schedules slightly
    # worse; docs/PERF.md round 4).  Turn on when host dispatch latency,
    # not device time, is the bottleneck (e.g. high-latency tunnels): one
    # dispatch per iteration instead of two.  Both paths are bitwise-
    # identical (tests/test_fused_build.py).
    fused_build: bool = False
    # builder/trainer chip split (parallel/pipeline.py): this many devices
    # build batch i+1 while the rest step on batch i — true overlap via
    # DISJOINT chips (a chip's queue is serial, so same-chip overlap does
    # not exist).  Default 0: with homogeneous chips and a data-parallel
    # build, serial DP build+step is provably throughput-optimal (see the
    # pipeline.py algebra); opt in when builders are spare capacity or the
    # trainers must sync at a cadence the build would stall.
    mesh_n_builders: int = 0

    def replace(self, **kw) -> "APRConfig":
        # lists (from CLI nargs / YAML) coerce to tuples so configs stay
        # hashable for jit static arguments
        for f in dataclasses.fields(self):
            if f.name in kw and isinstance(kw[f.name], list):
                kw[f.name] = tuple(kw[f.name])
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "APRConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in names}
        for f in dataclasses.fields(cls):
            if f.name in known and isinstance(f.default, tuple):
                known[f.name] = tuple(known[f.name])
        return cls(**known)

    @classmethod
    def load_json(cls, path: str) -> "APRConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    @classmethod
    def from_yaml(cls, path: str) -> "APRConfig":
        """Two-level YAML (Predator style) or flat YAML both flatten in."""
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f)
        flat = {}
        for k, v in raw.items():
            if isinstance(v, dict):
                flat.update(v)
            else:
                flat[k] = v
        return cls.from_dict(flat)
