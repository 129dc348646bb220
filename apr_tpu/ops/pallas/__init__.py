from apr_tpu.ops.pallas.distance import (
    chamfer_distance_pallas,
    directed_mean_sq_nn_pallas,
    nn_min_pallas,
)

__all__ = [
    "chamfer_distance_pallas",
    "directed_mean_sq_nn_pallas",
    "nn_min_pallas",
]
