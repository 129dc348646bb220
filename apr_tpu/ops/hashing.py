"""Collision-free packing of integer voxel coordinates into int32 keys.

The reference stacks build hash maps of voxel coordinates on the CPU
(MinkowskiEngine's coordinate manager; Predator's C++ grid_subsampling hash
map — reference grid_subsampling.cpp:5-211).  On TPU we instead give every
voxel a *collision-free* scalar key so that "hash table" operations become
sort / searchsorted / segment ops, which XLA compiles well.

Packing: each coordinate axis gets ``COORD_BITS`` bits (default 10, i.e.
values in [-512, 511] after offsetting).  3 × 10 = 30 bits fits an int32 with
the sign bit and one spare bit untouched, so packed keys are non-negative and
sort in lexicographic (x, y, z) order.  At the reference's 0.3 m KITTI voxel
size this covers ±153.6 m — beyond LiDAR range and beyond the key-frame crop
radius used by the APG pipeline (reference complement_data_loader.py:620-628).
Out-of-range coordinates are clipped (they would be cropped upstream anyway).

``INVALID_KEY`` (int32 max) sorts after every valid key; masked-out points map
to it so fixed-capacity ``jnp.unique`` calls push padding to the tail.
"""

from __future__ import annotations

import jax.numpy as jnp

COORD_BITS = 10
COORD_RANGE = 1 << COORD_BITS          # 1024 cells per axis
_OFFSET = COORD_RANGE // 2             # center the signed range
INVALID_KEY = jnp.iinfo(jnp.int32).max


def pack_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """Pack integer coords [..., 3] into non-negative int32 keys [...].

    Keys are unique per coordinate triple within [-512, 511]^3 and preserve
    lexicographic order.  Values outside the range are clipped.
    """
    c = jnp.clip(coords.astype(jnp.int32) + _OFFSET, 0, COORD_RANGE - 1)
    return (
        (c[..., 0] << (2 * COORD_BITS)) | (c[..., 1] << COORD_BITS) | c[..., 2]
    )


def unpack_coords(keys: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_coords`; keys [...] -> int32 coords [..., 3]."""
    mask = COORD_RANGE - 1
    x = (keys >> (2 * COORD_BITS)) & mask
    y = (keys >> COORD_BITS) & mask
    z = keys & mask
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32) - _OFFSET


# --- Morton (interleaved-bit) packing -------------------------------------
#
# The bit-field packing above sorts x-major LEXICOGRAPHICALLY — but halving
# coordinates does NOT preserve that order (merging two x cells can flip the
# y/z tie-break).  Morton keys interleave the bits, so halving ALL
# coordinates is one scalar ``key >> 3`` — trivially order-preserving —
# which lets a voxel pyramid reuse ONE sort for every level
# (ops.voxelize.voxelize_pyramid).  10 bits/axis -> keys < 2^30, int32-safe;
# INVALID_KEY still sorts after every valid key.

def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v to every 3rd bit position."""
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def _compact3(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_spread3`."""
    v = v & 0x09249249
    v = (v | (v >> 2)) & 0x030C30C3
    v = (v | (v >> 4)) & 0x0300F00F
    v = (v | (v >> 8)) & 0x030000FF
    v = (v | (v >> 16)) & (COORD_RANGE - 1)
    return v


def morton_pack(coords: jnp.ndarray) -> jnp.ndarray:
    """Interleaved-bit packing of integer coords [..., 3] -> int32 keys.

    Collision-free over [-512, 511]^3 (out-of-range clipped, like
    :func:`pack_coords`).  ``morton_pack(c) >> 3 == morton_pack(c >> 1)``
    for in-range c — the pyramid-coarsening identity.
    """
    c = jnp.clip(coords.astype(jnp.int32) + _OFFSET, 0, COORD_RANGE - 1)
    return (
        (_spread3(c[..., 0]) << 2)
        | (_spread3(c[..., 1]) << 1)
        | _spread3(c[..., 2])
    )


def morton_unpack(keys: jnp.ndarray, level: int = 0) -> jnp.ndarray:
    """Inverse of :func:`morton_pack`.

    ``level``: keys produced by ``morton_pack(c) >> 3*level`` decode to the
    level's coords ``(c >> level)`` — the offset subtracted is scaled down
    accordingly.
    """
    x = _compact3(keys >> 2)
    y = _compact3(keys >> 1)
    z = _compact3(keys)
    off = _OFFSET >> level
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32) - off
