"""Device-side batch assembly for pair training.

Everything the reference does per-item on CPU in DataLoader workers —
voxelize, correspondence search, collate (FCGF_APR/lib/
complement_data_loader.py:518-700, 1224-1279) — happens here as one jit
program over padded buffers: host code only reads files and pads.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from apr_tpu.models.sparse import SparsePyramid, build_pyramid
from apr_tpu.ops.voxelize import voxelize
from apr_tpu.registration.matching import gt_correspondences


class PairBatch(NamedTuple):
    """One batch of training pairs; every array has leading dim B."""

    pyramid0: SparsePyramid
    pyramid1: SparsePyramid
    feats0: jnp.ndarray     # [B, C0, 1] input features (ones)
    feats1: jnp.ndarray
    xyz0: jnp.ndarray       # [B, C0, 3] representative point per voxel
    xyz1: jnp.ndarray
    pos_src: jnp.ndarray    # [B, P] GT correspondence indices into voxels
    pos_tgt: jnp.ndarray
    pos_mask: jnp.ndarray   # [B, P]
    apc0: jnp.ndarray       # [B, M, 3] aggregated point cloud targets
    apc0_mask: jnp.ndarray
    apc1: jnp.ndarray
    apc1_mask: jnp.ndarray
    t_gt: jnp.ndarray       # [B, 4, 4] ground-truth transform cloud0 -> cloud1

    @property
    def batch_size(self):
        return self.feats0.shape[0]


@partial(
    jax.jit,
    static_argnames=("voxel_size", "capacities", "conv1_kernel_size",
                     "corr_cap", "search_multiplier", "with_correspondences"),
)
def make_pair_batch(
    points0: jnp.ndarray,   # [B, N, 3] padded raw points
    mask0: jnp.ndarray,     # [B, N]
    points1: jnp.ndarray,
    mask1: jnp.ndarray,
    apc0: jnp.ndarray,      # [B, M, 3]
    apc0_mask: jnp.ndarray,
    apc1: jnp.ndarray,
    apc1_mask: jnp.ndarray,
    t_gt: jnp.ndarray,      # [B, 4, 4]
    voxel_size: float = 0.3,
    capacities=(16384, 8192, 4096, 2048),
    conv1_kernel_size: int = 5,
    corr_cap: int = 1,
    search_multiplier: float = 1.5,
    with_correspondences: bool = True,
) -> PairBatch:
    """Voxelize both clouds, build pyramids, find GT correspondences.

    The GT match radius is voxel_size * search_multiplier, the reference's
    positive_pair_search_voxel_size_multiplier (complement_data_loader.py:677).
    ``with_correspondences=False`` (test time) skips the N x N GT radius
    search — the tester derives matches from features, not GT.
    """

    def one(pts0, m0, pts1, m1, t):
        g0 = voxelize(pts0, voxel_size, capacities[0], m0)
        g1 = voxelize(pts1, voxel_size, capacities[0], m1)
        pyr0 = build_pyramid(g0, capacities, conv1_kernel_size)
        pyr1 = build_pyramid(g1, capacities, conv1_kernel_size)
        # representative point per voxel (ME sparse_quantize 'sel' parity)
        n = pts0.shape[0]
        xyz0 = jnp.where(
            (g0.rep < n)[:, None], pts0[jnp.minimum(g0.rep, n - 1)], 0.0
        )
        xyz1 = jnp.where(
            (g1.rep < n)[:, None], pts1[jnp.minimum(g1.rep, n - 1)], 0.0
        )
        if with_correspondences:
            corr = gt_correspondences(
                xyz0, xyz1, t,
                radius=voxel_size * search_multiplier,
                cap_per_point=corr_cap,
                mask0=g0.mask, mask1=g1.mask,
            )
        else:
            from apr_tpu.registration.matching import Correspondences

            z = jnp.zeros((1,), jnp.int32)
            corr = Correspondences(z, z, jnp.zeros((1,), bool))
        return pyr0, pyr1, xyz0, xyz1, corr

    pyr0, pyr1, xyz0, xyz1, corr = jax.vmap(one)(
        points0, mask0, points1, mask1, t_gt
    )

    # voxel-dedup the APC targets (reference sel_nghb quantization,
    # complement_data_loader.py:669-674)
    def dedup(apc, am):
        g = voxelize(apc, voxel_size, apc.shape[0], am)
        n = apc.shape[0]
        pts = jnp.where(
            (g.rep < n)[:, None], apc[jnp.minimum(g.rep, n - 1)], 0.0
        )
        return pts, g.mask

    if apc0.shape[1] > 8:  # skip for the dummy test-time placeholders
        apc0, apc0_mask = jax.vmap(dedup)(apc0, apc0_mask)
        apc1, apc1_mask = jax.vmap(dedup)(apc1, apc1_mask)

    b, c0 = xyz0.shape[0], xyz0.shape[1]
    feats0 = jnp.where(
        pyr0.levels[0].mask[..., None], jnp.ones((b, c0, 1), jnp.float32), 0.0
    )
    feats1 = jnp.where(
        pyr1.levels[0].mask[..., None], jnp.ones((b, c0, 1), jnp.float32), 0.0
    )
    return PairBatch(
        pyramid0=pyr0,
        pyramid1=pyr1,
        feats0=feats0,
        feats1=feats1,
        xyz0=xyz0,
        xyz1=xyz1,
        pos_src=corr.src_idx,
        pos_tgt=corr.tgt_idx,
        pos_mask=corr.mask,
        apc0=apc0,
        apc0_mask=apc0_mask,
        apc1=apc1,
        apc1_mask=apc1_mask,
        t_gt=t_gt,
    )
