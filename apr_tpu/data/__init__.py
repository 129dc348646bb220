from apr_tpu.data.synthetic import synthetic_lidar_frame, synthetic_pair

__all__ = ["synthetic_lidar_frame", "synthetic_pair"]
