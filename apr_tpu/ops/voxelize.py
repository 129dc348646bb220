"""Fixed-capacity on-device voxelization.

Replaces three CPU-native voxel-hash variants of the reference with one
device-side primitive (parity targets, see SURVEY.md §2.3):

- ``ME.utils.sparse_quantize`` (dedup: one representative point per voxel) —
  reference FCGF_APR/lib/complement_data_loader.py:671-674,
- Open3D ``voxel_down_sample`` (barycenter) — reference
  Predator_APR/datasets/kitti.py:464-475,
- the in-repo C++ ``grid_subsampling`` (barycenter of points *and* features) —
  reference Predator_APR/cpp_wrappers/cpp_subsampling/grid_subsampling.cpp.

All outputs have static shapes: the caller picks a voxel ``capacity``; voxels
are produced in ascending packed-key order, padding (and overflow beyond
capacity) is pushed to the tail and flagged via ``mask``.  Instead of a hash
table (a CPU idiom) we pack coordinates into collision-free int32 keys and use
sort/searchsorted/segment ops, which XLA maps well onto TPU.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from apr_tpu.ops.hashing import INVALID_KEY, pack_coords, unpack_coords


class VoxelGrid(NamedTuple):
    """A voxelized point cloud with static capacity C over N input points.

    Attributes:
      coords:      int32 [C, 3] integer voxel coordinates (floor(p / voxel)).
      keys:        int32 [C] packed coordinate keys, ascending; INVALID at pad.
      mask:        bool  [C] True for real voxels.
      point_voxel: int32 [N] voxel index in [0, C) per input point, or C for
                   masked / overflowed points (sentinel == capacity).
      counts:      int32 [C] number of points in each voxel.
      barycenter:  float32 [C, 3] mean of member points (0 at padding).
      rep:         int32 [C] index of the first (lowest-index) member point,
                   or N at padding — the ``sel`` of ME.sparse_quantize.
    """

    coords: jnp.ndarray
    keys: jnp.ndarray
    mask: jnp.ndarray
    point_voxel: jnp.ndarray
    counts: jnp.ndarray
    barycenter: jnp.ndarray
    rep: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.keys.shape[0]

    @property
    def num_voxels(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))


def voxelize(
    points: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
) -> VoxelGrid:
    """Quantize ``points`` [N, 3] onto a voxel grid with static ``capacity``.

    If more than ``capacity`` distinct voxels exist, the voxels with the
    largest packed keys are dropped and their points map to the sentinel
    index ``capacity`` — size buckets upstream should make this rare.
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    keys = jnp.where(mask, pack_coords(coords), INVALID_KEY)

    uniq = jnp.unique(keys, size=capacity, fill_value=INVALID_KEY)
    vox_mask = uniq != INVALID_KEY

    # Inverse mapping via binary search over the sorted unique keys.
    slot = jnp.clip(jnp.searchsorted(uniq, keys), 0, capacity - 1)
    found = (uniq[slot] == keys) & mask & (keys != INVALID_KEY)
    point_voxel = jnp.where(found, slot, capacity).astype(jnp.int32)

    ones = found.astype(jnp.int32)
    counts = jax.ops.segment_sum(ones, point_voxel, num_segments=capacity + 1)[
        :capacity
    ]
    psum = jax.ops.segment_sum(
        jnp.where(found[:, None], points, 0.0),
        point_voxel,
        num_segments=capacity + 1,
    )[:capacity]
    barycenter = psum / jnp.maximum(counts, 1)[:, None]

    pidx = jnp.where(found, jnp.arange(n, dtype=jnp.int32), n)
    rep = jax.ops.segment_min(pidx, point_voxel, num_segments=capacity + 1)[
        :capacity
    ]
    rep = jnp.where(vox_mask, rep, n).astype(jnp.int32)

    return VoxelGrid(
        coords=jnp.where(vox_mask[:, None], unpack_coords(uniq), 0),
        keys=uniq,
        mask=vox_mask,
        point_voxel=point_voxel,
        counts=counts,
        barycenter=jnp.where(vox_mask[:, None], barycenter, 0.0),
        rep=rep,
    )


def voxelize_lean(
    points: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
):
    """:func:`voxelize` minus everything the FCGF batch build never reads.

    Returns ``(coords [C,3], keys [C] ascending, vox_mask [C], rep [C])`` —
    exactly the fields ``build_pyramid`` + the representative-point gather
    consume.  Skips the inverse point→voxel searchsorted and the
    counts/barycenter segment-sums of the full primitive, which the
    build-stage profile showed dominating it (tools/profile_build.py,
    docs/PERF.md round 4).  ``rep`` is the lowest original index per voxel
    (ME sparse_quantize 'sel' parity — the stable sort keeps the first
    occurrence first in each run).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    keys = jnp.where(mask, pack_coords(coords), INVALID_KEY)
    k_sorted, idx_sorted = jax.lax.sort(
        (keys, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    uniq, seg = unique_of_sorted(k_sorted, capacity)
    vox_mask = uniq != INVALID_KEY
    found = seg < capacity
    rep = jax.ops.segment_min(
        jnp.where(found, idx_sorted, n), seg, num_segments=capacity + 1
    )[:capacity]
    rep = jnp.where(vox_mask, rep, n).astype(jnp.int32)
    return (
        jnp.where(vox_mask[:, None], unpack_coords(uniq), 0),
        uniq, vox_mask, rep,
    )


def dedup_points(
    points: jnp.ndarray,
    voxel_size: float,
    mask: Optional[jnp.ndarray] = None,
):
    """One representative point per occupied voxel, IN PLACE of the input
    buffer: returns ``(points_out [N,3], keep_mask [N])`` where masked-out
    rows are duplicates (or input padding) zeroed out.

    Equivalent to ``voxelize(...cap=N...)`` + rep-gather for consumers that
    only read (points, mask) — the APC reconstruction targets — but with
    ZERO segment/scatter/searchsorted ops: one stable multi-operand sort
    (key + the three coordinate planes) and a run-boundary scan.  Output
    rows land in ascending-key order with holes at duplicate positions;
    order is irrelevant to the masked Chamfer.  The representative is the
    lowest-original-index member of each voxel (stable sort), matching
    ME.sparse_quantize 'sel' (reference complement_data_loader.py:671-674).
    Measured 97.6 → ~6 ms per 8-cloud batch at 65k capacity (v5e,
    tools/profile_build.py).
    """
    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    coords = jnp.floor(points / voxel_size).astype(jnp.int32)
    keys = jnp.where(mask, pack_coords(coords), INVALID_KEY)
    ks, px, py, pz = jax.lax.sort(
        (keys, points[:, 0], points[:, 1], points[:, 2]), num_keys=1)
    valid = ks != INVALID_KEY
    is_first = valid & jnp.concatenate(
        [jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    pts = jnp.stack([px, py, pz], axis=-1)
    return jnp.where(is_first[:, None], pts, 0.0), is_first


def unique_of_sorted(sorted_keys: jnp.ndarray, capacity: int):
    """``jnp.unique(size=capacity)`` for ALREADY-SORTED keys — a boundary
    scan instead of a fresh O(N log N) sort.

    ``sorted_keys`` must be non-decreasing with INVALID_KEY padding at the
    tail.  Returns (uniq [capacity] ascending INVALID-padded with the
    largest keys dropped on overflow, seg [N] segment id per row with
    sentinel ``capacity`` for padding/overflow rows).
    """
    valid = sorted_keys != INVALID_KEY
    is_new = valid & jnp.concatenate([
        jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]
    ])
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    seg = jnp.where(valid & (seg < capacity), seg, capacity)
    # segment_min identity is int32 max == INVALID_KEY: empty segments pad
    uniq = jax.ops.segment_min(
        jnp.where(valid, sorted_keys, INVALID_KEY), seg,
        num_segments=capacity + 1,
    )[:capacity]
    return uniq, seg


def voxelize_pyramid(
    points: jnp.ndarray,
    base_voxel: float,
    capacities,
    mask: Optional[jnp.ndarray] = None,
):
    """All pyramid levels (voxel = base * 2^l) from ONE argsort.

    Semantically equivalent to ``tuple(voxelize(points, base_voxel * 2**l,
    capacities[l], mask) for l)`` up to voxel ORDERING, but ~L times cheaper:
    points are sorted ONCE by level-0 MORTON key; the level-l key is the
    scalar ``key0 >> 3*l`` (= Morton of the floor-halved coords), which keeps
    the same sorted order, so each coarser level is a boundary scan
    (:func:`unique_of_sorted`), not a fresh sort.

    Ordering caveat: voxels come out in MORTON order and ``keys`` holds
    morton keys — NOT the x-major :func:`pack_coords` keys ``voxelize``
    emits.  The KPConv pyramid consumes barycenters/masks only, where order
    is irrelevant; don't mix these grids with searchsorted logic built on
    pack_coords keys.  X-major keys flip order under floor-halving (merging
    two x cells re-ties on y/z), which is why the boundary-scan trick needs
    Morton.  Overflow beyond ``capacities[l]`` drops the morton-largest
    voxels (voxelize drops the pack-largest — degenerate either way).
    """
    from apr_tpu.ops.hashing import morton_pack, morton_unpack

    n = points.shape[0]
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    coords0 = jnp.floor(points / base_voxel).astype(jnp.int32)
    key0 = jnp.where(mask, morton_pack(coords0), INVALID_KEY)
    order = jnp.argsort(key0).astype(jnp.int32)
    k_sorted = key0[order]
    p_sorted = points[order]
    valid_sorted = k_sorted != INVALID_KEY
    orig_idx = order

    grids = []
    for l, cap in enumerate(capacities):
        k_l = jnp.where(valid_sorted, k_sorted >> (3 * l), INVALID_KEY)
        uniq, seg = unique_of_sorted(k_l, cap)
        vox_mask = uniq != INVALID_KEY
        found = seg < cap
        ones = found.astype(jnp.int32)
        counts = jax.ops.segment_sum(ones, seg, num_segments=cap + 1)[:cap]
        psum = jax.ops.segment_sum(
            jnp.where(found[:, None], p_sorted, 0.0), seg,
            num_segments=cap + 1,
        )[:cap]
        barycenter = psum / jnp.maximum(counts, 1)[:, None]
        rep = jax.ops.segment_min(
            jnp.where(found, orig_idx, n), seg, num_segments=cap + 1
        )[:cap]
        rep = jnp.where(vox_mask, rep, n).astype(jnp.int32)
        point_voxel = (
            jnp.full((n,), cap, jnp.int32).at[order].set(
                jnp.minimum(seg, cap).astype(jnp.int32))
        )
        grids.append(VoxelGrid(
            coords=jnp.where(vox_mask[:, None], morton_unpack(uniq, l), 0),
            keys=uniq,
            mask=vox_mask,
            point_voxel=point_voxel,
            counts=counts,
            barycenter=jnp.where(vox_mask[:, None], barycenter, 0.0),
            rep=rep,
        ))
    return tuple(grids)


def voxel_down_sample(
    points: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    mask: Optional[jnp.ndarray] = None,
):
    """Open3D ``voxel_down_sample`` parity: barycenters of occupied voxels.

    Returns (points [C, 3], mask [C]).
    """
    grid = voxelize(points, voxel_size, capacity, mask)
    return grid.barycenter, grid.mask


def grid_subsample(
    points: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    features: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """C++ ``grid_subsampling`` parity: barycenter of points and mean features.

    Returns (points [C, 3], features [C, F] or None, mask [C]).
    """
    grid = voxelize(points, voxel_size, capacity, mask)
    if features is None:
        return grid.barycenter, None, grid.mask
    found = grid.point_voxel < capacity
    fsum = jax.ops.segment_sum(
        jnp.where(found[:, None], features, 0.0),
        grid.point_voxel,
        num_segments=capacity + 1,
    )[:capacity]
    fmean = fsum / jnp.maximum(grid.counts, 1)[:, None]
    return grid.barycenter, jnp.where(grid.mask[:, None], fmean, 0.0), grid.mask
