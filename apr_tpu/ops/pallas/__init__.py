from apr_tpu.ops.pallas.distance import nn_min_pallas

__all__ = ["nn_min_pallas"]
