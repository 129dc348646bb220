"""Dataset interface + synthetic implementation.

A dataset yields *pair dicts* (numpy, host-side):
    points0, points1: [N, 3] raw clouds in their own sensor frames
    apc0, apc1:       [M, 3] aggregated point cloud targets (train phases)
    t_gt:             [4, 4] ground truth mapping frame0 -> frame1

KITTI/nuScenes implementations (apr_tpu.data.kitti / .nuscenes) provide the
same interface; the synthetic one backs tests/benchmarks (the reference has
no fixtures at all, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from apr_tpu.config import APRConfig
from apr_tpu.data.synthetic import synthetic_pair


class PairDataset:
    """Abstract: len() + get_pair(i)."""

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def get_pair(self, index: int) -> Dict[str, np.ndarray]:  # pragma: no cover
        raise NotImplementedError


class SyntheticPairDataset(PairDataset):
    """Deterministic synthetic pairs; distance sampled in [min, max] like the
    reference's uniform LiDAR-distance pair generation
    (complement_data_loader.py:206-250)."""

    def __init__(
        self,
        num_pairs: int = 64,
        n_points: int = 30000,
        apc_points: int = 60000,
        min_dist: float = 5.0,
        max_dist: float = 20.0,
        extent: float = 60.0,
        seed: int = 0,
        phase: str = "train",
    ):
        self.num_pairs = num_pairs
        self.n_points = n_points
        self.apc_points = apc_points
        self.min_dist = min_dist
        self.max_dist = max_dist
        self.extent = extent
        self.base_seed = seed + {"train": 0, "val": 10_000, "test": 20_000}[phase]

    def __len__(self):
        return self.num_pairs

    def get_pair(self, index: int) -> Dict[str, np.ndarray]:
        seed = self.base_seed + index
        rng = np.random.default_rng(seed)
        dist = float(rng.uniform(self.min_dist, self.max_dist))
        return synthetic_pair(
            seed=seed,
            n_points=self.n_points,
            apc_points=self.apc_points,
            distance=dist,
            extent=self.extent,
        )


def make_dataset(config: APRConfig, phase: str) -> PairDataset:
    """Dataset factory by config.dataset name (reference make_data_loader)."""
    name = config.dataset
    if name in ("SyntheticPairDataset", "synthetic"):
        return SyntheticPairDataset(
            num_pairs={"train": 64, "val": 16, "test": 16}[phase],
            min_dist=config.pair_min_dist,
            max_dist=config.pair_max_dist,
            seed=config.seed,
            phase=phase,
        )
    if name == "PairComplementKittiDataset":
        from apr_tpu.data.kitti import KittiComplementDataset

        return KittiComplementDataset(config, phase)
    if name in ("KITTIPairDataset", "KITTINMPairDataset",
                "KITTIRandDistPairDataset"):
        # distinct baseline pairings (reference data_loaders.py:284-700),
        # NOT the APG complement walk
        from apr_tpu.data.kitti import KittiBaselinePairDataset

        mode = {"KITTIPairDataset": "time_diff",
                "KITTINMPairDataset": "nm",
                "KITTIRandDistPairDataset": "rand_dist"}[name]
        return KittiBaselinePairDataset(config, phase, mode)
    if name == "PairComplementNuscenesDataset":
        from apr_tpu.data.nuscenes import NuscenesComplementDataset

        return NuscenesComplementDataset(config, phase)
    if name in ("IndoorDataset", "ThreeDMatchPairDataset"):
        from apr_tpu.data.indoor import IndoorDataset

        return IndoorDataset(config, phase)
    if name == "ModelNetHdf":
        from apr_tpu.data.modelnet import ModelNetHdf

        return ModelNetHdf(config, phase)
    raise ValueError(f"unknown dataset: {name}")
