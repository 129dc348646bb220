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
