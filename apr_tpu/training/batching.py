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

from apr_tpu.models.sparse import (
    SparseLevel,
    SparsePyramid,
    build_pyramid_from_level,
)
from apr_tpu.ops.voxelize import dedup_points, voxelize_lean
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

    # Both cloud sides ride ONE vmapped build over the stacked [2B] batch:
    # the pyramid ops (sorts, kernel-map lookups) are op-overhead bound on
    # TPU, so one 2B-wide program costs far less than two B-wide copies and
    # halves the HLO the compiler has to chew through (docs/PERF.md).
    def one_cloud(pts, m):
        # lean voxelize: keys/mask/rep only — no inverse map or
        # counts/barycenter segment-sums (tools/profile_build.py)
        coords, keys, vmask, rep = voxelize_lean(
            pts, voxel_size, capacities[0], m)
        pyr = build_pyramid_from_level(
            SparseLevel(coords=coords, keys=keys, mask=vmask),
            capacities, conv1_kernel_size)
        # representative point per voxel (ME sparse_quantize 'sel' parity)
        n = pts.shape[0]
        xyz = jnp.where(
            (rep < n)[:, None], pts[jnp.minimum(rep, n - 1)], 0.0
        )
        return pyr, xyz, vmask

    b = points0.shape[0]
    pyr, xyz, gmask = jax.vmap(one_cloud)(
        jnp.concatenate([points0, points1], 0),
        jnp.concatenate([mask0, mask1], 0),
    )
    pyr0 = jax.tree.map(lambda x: x[:b], pyr)
    pyr1 = jax.tree.map(lambda x: x[b:], pyr)
    xyz0, xyz1 = xyz[:b], xyz[b:]

    if with_correspondences:
        corr = jax.vmap(
            lambda x0, x1, t, m0, m1: gt_correspondences(
                x0, x1, t,
                radius=voxel_size * search_multiplier,
                cap_per_point=corr_cap,
                mask0=m0, mask1=m1,
            )
        )(xyz0, xyz1, t_gt, gmask[:b], gmask[b:])
    else:
        from apr_tpu.registration.matching import Correspondences

        z = jnp.zeros((b, 1), jnp.int32)
        corr = Correspondences(z, z, jnp.zeros((b, 1), bool))

    # voxel-dedup the APC targets (reference sel_nghb quantization,
    # complement_data_loader.py:669-674) — the lean in-place dedup: the
    # masked Chamfer reads (points, mask) only, so no compaction/inverse
    # is needed (97.6 -> ~6 ms per 8-cloud batch, tools/profile_build.py)
    def dedup(apc, am):
        return dedup_points(apc, voxel_size, am)

    if apc0.shape[1] > 8:  # skip for the dummy test-time placeholders
        # same 2B fold as the pyramids: one dedup program for both sides
        apc, apc_mask = jax.vmap(dedup)(
            jnp.concatenate([apc0, apc1], 0),
            jnp.concatenate([apc0_mask, apc1_mask], 0),
        )
        apc0, apc1 = apc[:b], apc[b:]
        apc0_mask, apc1_mask = apc_mask[:b], apc_mask[b:]

    c0 = xyz0.shape[1]
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
