from apr_tpu.ops.hashing import pack_coords, unpack_coords, COORD_BITS, COORD_RANGE
from apr_tpu.ops.voxelize import (
    VoxelGrid,
    voxelize,
    voxel_down_sample,
    grid_subsample,
)
from apr_tpu.ops.neighbors import radius_neighbors, knn
from apr_tpu.ops.chamfer import nn_distances, chamfer_distance
from apr_tpu.ops.pooling import segment_mean_capped

__all__ = [
    "pack_coords",
    "unpack_coords",
    "COORD_BITS",
    "COORD_RANGE",
    "VoxelGrid",
    "voxelize",
    "voxel_down_sample",
    "grid_subsample",
    "radius_neighbors",
    "knn",
    "nn_distances",
    "chamfer_distance",
    "segment_mean_capped",
]
