"""Sparse voxel tensors: coordinate pyramids + kernel maps, TPU-style.

This is the rebuild of MinkowskiEngine's coordinate manager + sparse
convolution (the external C++/CUDA dependency of the reference FCGF stack,
SURVEY.md §2.3 item 1).  Instead of CPU hash tables we keep each level's
voxel coordinates as a *sorted array of packed int32 keys* (see
apr_tpu.ops.hashing); kernel maps become vectorized binary searches, and the
sparse convolution becomes K gather+matmul accumulation steps — all static
shapes, all on device.

Semantics mirror ME for the ResUNet use-case:
- stride-2 downsampling: output voxel coords = unique(floor(c / 2)) over the
  input voxels (ME quantizes onto the doubled tensor stride);
- a kernel-size-k same-level conv covers offsets in [-(k-1)/2, (k-1)/2]^3 in
  units of the level's stride;
- a stride-2 down conv with kernel 3 gathers fine voxels at 2*q + o,
  o in [-1, 0, 1]^3, for each coarse output voxel q;
- the transposed (up) conv is the exact adjoint: fine voxel f receives coarse
  contributions from c = (f - o) / 2 wherever f - o is even per-axis;
- missing neighbors hit the sentinel row (index == capacity) which carries
  zero features, exactly ME's out-of-map behavior.

Every map is a sentinel-padded int32 table, so a whole U-Net forward is one
jit program with zero host synchronization.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from apr_tpu.ops.hashing import COORD_BITS, INVALID_KEY, pack_coords
from apr_tpu.ops.voxelize import VoxelGrid


class SparseLevel(NamedTuple):
    """Voxels of one pyramid level (tensor stride 2^l), fixed capacity C_l.

    coords are in *level units* (already divided by the stride).
    """

    coords: jnp.ndarray  # int32 [C, 3]
    keys: jnp.ndarray    # int32 [C], ascending, INVALID_KEY padding
    mask: jnp.ndarray    # bool  [C]


def offsets_grid(kernel_size: int) -> np.ndarray:
    """All integer offsets of a cubic kernel, ME's region ordering (z fastest)."""
    r = kernel_size // 2
    rng = np.arange(-r, r + 1)
    grid = np.stack(
        np.meshgrid(rng, rng, rng, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return grid.astype(np.int32)


def lookup_keys(level_keys: jnp.ndarray, query_keys: jnp.ndarray) -> jnp.ndarray:
    """Index of each query key in the sorted level keys, or C if absent.

    method='sort' lowers to one vectorized sort of keys+queries instead of a
    per-query sequential binary-search loop — much faster on TPU for the
    many-queries-few-keys shape of kernel-map construction.
    """
    c = level_keys.shape[0]
    slot = jnp.clip(
        jnp.searchsorted(level_keys, query_keys, method="sort"), 0, c - 1
    )
    found = level_keys[slot] == query_keys
    return jnp.where(found, slot, c).astype(jnp.int32)


def _query_all_offsets(level: SparseLevel, query_coords, query_mask):
    """Lookup [K, C, 3] query coords in one batched searchsorted.

    One fused lookup over all kernel offsets beats K separate searches: the
    'sort'-method searchsorted amortizes a single vectorized sort across the
    whole K*C query set.
    """
    k, c = query_coords.shape[0], query_coords.shape[1]
    qk = pack_coords(query_coords)                      # [K, C]
    qk = jnp.where(query_mask, qk, INVALID_KEY)
    idx = lookup_keys(level.keys, qk.reshape(-1)).reshape(k, c)
    # a query for INVALID_KEY must never match padding keys
    return jnp.where(query_mask, idx, level.keys.shape[0])


def kernel_map_same(level: SparseLevel, kernel_size: int = 3) -> jnp.ndarray:
    """[C, k^3] neighbor table for a same-level conv (sentinel = C)."""
    offs = jnp.asarray(offsets_grid(kernel_size))       # [K, 3]
    q = level.coords[None, :, :] + offs[:, None, :]     # [K, C, 3]
    maps = _query_all_offsets(level, q, level.mask[None, :])
    return maps.T  # [C, k^3]


def kernel_map_down(
    coarse: SparseLevel, fine: SparseLevel, kernel_size: int = 3
) -> jnp.ndarray:
    """[C_coarse, k^3] table of fine-level inputs for a stride-2 conv."""
    offs = jnp.asarray(offsets_grid(kernel_size))
    base = coarse.coords * 2
    q = base[None, :, :] + offs[:, None, :]
    maps = _query_all_offsets(fine, q, coarse.mask[None, :])
    return maps.T


def kernel_map_up(
    fine: SparseLevel, coarse: SparseLevel, kernel_size: int = 3
) -> jnp.ndarray:
    """[C_fine, k^3] table of coarse-level inputs for the transposed conv.

    Entry (f, o) = index of coarse voxel (fine_coords[f] - o) / 2 when that
    division is exact, else sentinel.  This is the adjoint of
    :func:`kernel_map_down` with matching offset order, so a weight tensor
    indexed by o is shared consistently between the two directions.
    """
    offs = jnp.asarray(offsets_grid(kernel_size))
    cc = coarse.keys.shape[0]
    shifted = fine.coords[None, :, :] - offs[:, None, :]   # [K, Cf, 3]
    even = jnp.all((shifted & 1) == 0, axis=-1)            # [K, Cf]
    cand = shifted >> 1
    maps = _query_all_offsets(coarse, cand, fine.mask[None, :] & even)
    maps = jnp.where(even, maps, cc)
    return maps.T


def _zrun_maps(
    support_keys: jnp.ndarray,   # [S] sorted packed keys (INVALID padding)
    base_keys: jnp.ndarray,      # [C] packed key of each base coordinate
    base_coords: jnp.ndarray,    # [C, 3] base coords (support-level units)
    base_mask: jnp.ndarray,      # [C]
    kernel_size: int,
) -> jnp.ndarray:
    """All k^3 offset lookups with k^2 sorted queries + z-run decoding.

    For a fixed (ox, oy), the k targets pack(base + (ox, oy, oz)),
    oz = -r..r, are CONSECUTIVE int32 keys (the z field is the low bits of
    apr_tpu.ops.hashing.pack_coords).  Present targets therefore occupy
    consecutive positions in the sorted support keys starting at
    j0 = searchsorted(keys, first_target): one searchsorted over k^2 * C
    queries (vs k^3 * C in the naive form) plus k shifted gathers per
    column decodes every oz slot.  Measured ~4x faster than the one-big-
    sort lookup for the 5^3 conv1 map at KITTI scale on v5e.

    Returns [K, C] row-major over offsets_grid ordering (x, y major, z
    fastest), sentinel S.
    """
    s = support_keys.shape[0]
    c = base_keys.shape[0]
    r = kernel_size // 2
    k = kernel_size
    two_b = 2 * COORD_BITS

    xy = [(ox, oy) for ox in range(-r, r + 1) for oy in range(-r, r + 1)]
    # field-overflow guard: pack() arithmetic is only linear while every
    # shifted component stays inside its 10-bit field
    lo, hi = -(1 << (COORD_BITS - 1)), (1 << (COORD_BITS - 1)) - 1
    cx, cy, cz = base_coords[:, 0], base_coords[:, 1], base_coords[:, 2]
    z_ok = (cz - r >= lo) & (cz + r <= hi)

    t0s = []
    oks = []
    for ox, oy in xy:
        delta = (ox << two_b) + (oy << COORD_BITS) - r
        ok = (base_mask & z_ok
              & (cx + ox >= lo) & (cx + ox <= hi)
              & (cy + oy >= lo) & (cy + oy <= hi))
        t0s.append(jnp.where(ok, base_keys + delta, INVALID_KEY))
        oks.append(ok)
    t0 = jnp.stack(t0s)          # [G, C] first-target key per column
    ok = jnp.stack(oks)          # [G, C]

    # Each row of t0 is base_keys + const (sorted where ok, INVALID holes),
    # and support_keys is sorted — a merge, not a sort.  On TPU the Pallas
    # merge-path kernel exploits that (docs/PERF.md round-4 "sort floor"
    # study, 1.5-3x); XLA's method='sort' re-sorts support+queries and is
    # the fallback elsewhere (Pallas CPU = interpret mode, far slower than
    # the XLA sort).  platform_dependent picks per LOWERING platform, so
    # jit-for-CPU on a TPU host (tests, jax.default_device) stays correct.
    def _j0_sort(sk, t):
        return jnp.searchsorted(
            sk, t.reshape(-1), method="sort"
        ).astype(jnp.int32).reshape(len(xy), c)

    if c % 128 == 0 and s % 128 == 0 and s <= 16384:
        from apr_tpu.ops.pallas.searchsorted import searchsorted_left

        j0 = jax.lax.platform_dependent(
            support_keys, t0, tpu=searchsorted_left, default=_j0_sort)
    else:
        j0 = _j0_sort(support_keys, t0)

    # decode all groups by gathering each window [j0, j0+k) as ONE ROW of a
    # precomputed [S, k] shifted-keys matrix: G*C row gathers instead of
    # G*k*C scalar gathers.  TPU pads every gathered unit to a 128-lane
    # tile, so scalar gathers waste 128x the bandwidth; rows waste 128/k —
    # measured 155 -> ~20 ms for the 5^3 map at KITTI scale on v5e.
    shifted = [
        jnp.concatenate([
            support_keys[m:],
            jnp.full((m,), INVALID_KEY, support_keys.dtype),
        ])
        for m in range(k)
    ]
    kst = jnp.stack(shifted, axis=1)                       # [S, k]
    v = kst[jnp.minimum(j0, s - 1)]                        # [G, C, k]
    t = v - t0[:, :, None]                                 # oz slot of each
    offs_m = jnp.arange(k, dtype=jnp.int32)
    idx = jnp.minimum(j0[:, :, None] + offs_m[None, None, :], s - 1)
    slots = []
    for oz in range(k):
        hit = (t == oz) & ok[:, :, None]
        slots.append(jnp.min(jnp.where(hit, idx, s), axis=2))  # [G, C]
    stacked = jnp.stack(slots, axis=1)          # [G, k, C]
    return stacked.reshape(len(xy) * k, c)      # offsets_grid order



def kernel_map_same_fast(level: SparseLevel, kernel_size: int = 3):
    """kernel_map_same via the z-run decomposition (exact for in-range
    coords; out-of-field coords map to the sentinel instead of clipping)."""
    maps = _zrun_maps(level.keys, level.keys, level.coords, level.mask,
                      kernel_size)
    return maps.T


def kernel_map_down_fast(coarse: SparseLevel, fine: SparseLevel,
                         kernel_size: int = 3):
    """kernel_map_down via the z-run decomposition."""
    base = coarse.coords * 2
    base_keys = jnp.where(coarse.mask, pack_coords(base), INVALID_KEY)
    maps = _zrun_maps(fine.keys, base_keys, base, coarse.mask, kernel_size)
    return maps.T


def transpose_kernel_map(down: jnp.ndarray, n_fine: int,
                         n_coarse: int) -> jnp.ndarray:
    """Derive the up (transposed-conv) map from the down map by scatter.

    down[c, j] = f  <=>  up[f, j] = c (the maps are structural adjoints,
    see kernel_map_up); one [C_coarse * K] scatter replaces the whole
    lookup.  Sentinel rows of ``down`` land in a dropped overflow row.
    """
    k = down.shape[1]
    rows = jnp.broadcast_to(
        jnp.arange(down.shape[0], dtype=jnp.int32)[:, None], down.shape)
    cols = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                            down.shape)
    out = jnp.full((n_fine + 1, k), n_coarse, jnp.int32)
    out = out.at[jnp.minimum(down, n_fine), cols].set(rows)
    return out[:n_fine]


def downsample_level(level: SparseLevel, capacity: int) -> SparseLevel:
    """Coarsen by 2: unique floor-halved coords, fixed capacity.

    NOTE: halved X-MAJOR packed keys are NOT sorted even though the input
    keys are (floor-halving x can merge groups whose y/z order then flips),
    so this needs the full sorting unique — the boundary-scan shortcut only
    works for Morton keys (see ops.voxelize.voxelize_pyramid).
    """
    coarse_coords = level.coords >> 1  # floor division incl. negatives
    keys = jnp.where(level.mask, pack_coords(coarse_coords), INVALID_KEY)
    uniq = jnp.unique(keys, size=capacity, fill_value=INVALID_KEY)
    mask = uniq != INVALID_KEY
    from apr_tpu.ops.hashing import unpack_coords

    return SparseLevel(
        coords=jnp.where(mask[:, None], unpack_coords(uniq), 0),
        keys=uniq,
        mask=mask,
    )


class SparsePyramid(NamedTuple):
    """Everything a sparse U-Net forward needs, precomputed once per cloud."""

    levels: Tuple[SparseLevel, ...]
    same_maps: Tuple[jnp.ndarray, ...]   # per level: [C_l, 27]
    down_maps: Tuple[jnp.ndarray, ...]   # level l -> l+1: [C_{l+1}, 27]
    up_maps: Tuple[jnp.ndarray, ...]     # level l+1 -> l: [C_l, 27]
    conv1_map: jnp.ndarray               # [C_0, k1^3] first-conv table


@partial(jax.jit, static_argnames=("capacities", "conv1_kernel_size"))
def build_pyramid(
    grid: VoxelGrid,
    capacities: Sequence[int],
    conv1_kernel_size: int = 5,
) -> SparsePyramid:
    """Build the full coordinate pyramid from a level-0 voxelization.

    ``capacities[l]`` is the static voxel budget of level l; ``capacities[0]``
    must equal ``grid.capacity``.
    """
    assert capacities[0] == grid.capacity, (capacities[0], grid.capacity)
    return build_pyramid_from_level(
        SparseLevel(coords=grid.coords, keys=grid.keys, mask=grid.mask),
        capacities, conv1_kernel_size,
    )


def build_pyramid_from_level(
    level0: SparseLevel,
    capacities: Sequence[int],
    conv1_kernel_size: int = 5,
) -> SparsePyramid:
    """:func:`build_pyramid` from a bare level-0 (coords/keys/mask) — the
    lean voxelizer (ops.voxelize.voxelize_lean) produces exactly this."""
    assert capacities[0] == level0.keys.shape[0]
    levels: List[SparseLevel] = [level0]
    for cap in capacities[1:]:
        levels.append(downsample_level(levels[-1], cap))

    down_maps = tuple(
        kernel_map_down_fast(levels[l + 1], levels[l], 3)
        for l in range(len(levels) - 1)
    )
    up_maps = tuple(
        transpose_kernel_map(down_maps[l], n_fine=capacities[l],
                             n_coarse=capacities[l + 1])
        for l in range(len(levels) - 1)
    )
    conv1_map = kernel_map_same_fast(levels[0], conv1_kernel_size)
    # the level-0 3^3 same map is the central sub-block of the conv1 map
    # whenever conv1 covers it (k >= 3, odd) — skip its whole zrun build
    if conv1_kernel_size >= 3:
        r1 = conv1_kernel_size // 2
        sel = [
            ((ox + r1) * conv1_kernel_size + (oy + r1)) * conv1_kernel_size
            + (oz + r1)
            for ox in (-1, 0, 1) for oy in (-1, 0, 1) for oz in (-1, 0, 1)
        ]
        same0 = conv1_map[:, jnp.asarray(sel)]
    else:
        same0 = kernel_map_same_fast(levels[0], 3)
    same_maps = (same0,) + tuple(
        kernel_map_same_fast(lv, 3) for lv in levels[1:]
    )
    return SparsePyramid(
        levels=tuple(levels),
        same_maps=same_maps,
        down_maps=down_maps,
        up_maps=up_maps,
        conv1_map=conv1_map,
    )


def sparse_conv_apply(
    feats: jnp.ndarray,      # [N_in, Ci] source features
    table: jnp.ndarray,      # [N_out, K] indices into feats (sentinel N_in)
    weights: jnp.ndarray,    # [K, Ci, Co]
    out_mask: Optional[jnp.ndarray] = None,  # [N_out]
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Gather-matmul sparse convolution: one cloud.

    One [N_out, K, Ci] neighbor gather followed by ONE MXU matmul
    [N_out, K*Ci] @ [K*Ci, Co].  A scan of K small [N, Ci] @ [Ci, Co]
    matmuls is mathematically identical but dispatch-serialized and starves
    the 128x128 systolic array (measured 7x slower for the full encoder on
    v5e); the fused contraction keeps the MXU at a real tile shape.  The
    sentinel row (index == N_in) gathers the appended zero row — ME's
    out-of-map behavior.

    ``compute_dtype=jnp.bfloat16`` casts activations + weights before the
    gather/matmul (halves gather HBM traffic, 4x MXU rate vs fp32 on v5e)
    while accumulating in float32; params stay fp32 masters.  Output dtype
    is float32 either way so norms/losses keep full precision.
    """
    n_in, ci = feats.shape
    n_out, k = table.shape
    co = weights.shape[-1]
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    padded = jnp.concatenate([feats, jnp.zeros((1, ci), feats.dtype)], 0)
    gathered = padded[jnp.minimum(table, n_in)]          # [N_out, K, Ci]
    out = jax.lax.dot_general(
        gathered.reshape(n_out, k * ci),
        weights.reshape(k * ci, co),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if out_mask is not None:
        out = jnp.where(out_mask[:, None], out, 0.0)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Scatter-free autodiff: the input gradient of a gather-matmul conv is
# ANOTHER gather-matmul over the transpose kernel map
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def sparse_conv_adjoint(
    feats: jnp.ndarray,      # [N_in, Ci]
    table: jnp.ndarray,      # [N_out, K] into feats (sentinel N_in)
    table_t: jnp.ndarray,    # [N_in, K] into OUTPUT rows (sentinel N_out)
    weights: jnp.ndarray,    # [K, Ci, Co]
    out_mask: Optional[jnp.ndarray],
    in_mask: Optional[jnp.ndarray],
    reverse_k: bool = False,
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """sparse_conv_apply with a scatter-free backward.

    XLA's autodiff of the forward gather is a row scatter-add — the slowest
    memory op on TPU (measured ~3x the whole forward).  But the adjacency is
    symmetric: voxel i feeds output o through offset j exactly when o feeds
    i through the structural transpose, so

        d feats = gather_matmul(g, table_t, W~),   W~[j] = W[p(j)]^T

    where (table_t, p) are:
      - same-level conv:   table_t = table,       p(j) = K-1-j
        (offsets_grid is centrosymmetric: offs[K-1-j] == -offs[j]);
      - strided down conv: table_t = up kernel map,   p = identity
        (kernel_map_up is built as kernel_map_down's adjoint, sparse.py);
      - transposed conv:   table_t = down kernel map, p = identity.

    The weight gradient re-gathers the inputs (one extra gather) instead of
    saving the [N_out, K, Ci] neighbor tensor — O(N*C) residual memory.
    """
    cd = jnp.dtype(compute_dtype) if compute_dtype else None
    return sparse_conv_apply(feats, table, weights, out_mask, cd)


def _sca_fwd(feats, table, table_t, weights, out_mask, in_mask,
             reverse_k, compute_dtype):
    cd = jnp.dtype(compute_dtype) if compute_dtype else None
    out = sparse_conv_apply(feats, table, weights, out_mask, cd)
    return out, (feats, table, table_t, weights, out_mask, in_mask)


def _sca_bwd(reverse_k, compute_dtype, res, g):
    feats, table, table_t, weights, out_mask, in_mask = res
    cd = jnp.dtype(compute_dtype) if compute_dtype else None
    n_in, ci = feats.shape
    n_out, k = table.shape
    co = weights.shape[-1]

    g = g.astype(jnp.float32)
    if out_mask is not None:
        g = jnp.where(out_mask[:, None], g, 0.0)

    # d feats: gather-matmul of g over the transpose map
    w_t = jnp.transpose(weights, (0, 2, 1))          # [K, Co, Ci]
    if reverse_k:
        w_t = w_t[::-1]
    dfeats = sparse_conv_apply(g, table_t, w_t, in_mask, cd)

    # d weights: re-gather inputs, one [K*Ci, N_out] @ [N_out, Co] matmul
    f = feats.astype(cd) if cd is not None else feats
    gm = g.astype(cd) if cd is not None else g
    padded = jnp.concatenate([f, jnp.zeros((1, ci), f.dtype)], 0)
    gathered = padded[jnp.minimum(table, n_in)].reshape(n_out, k * ci)
    dw = jax.lax.dot_general(
        gathered, gm,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(k, ci, co).astype(weights.dtype)

    return dfeats.astype(feats.dtype), None, None, dw, None, None


sparse_conv_adjoint.defvjp(_sca_fwd, _sca_bwd)
