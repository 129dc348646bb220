from apr_tpu.geometry.se3 import (
    apply_transform,
    compose,
    inverse,
    rotation_from_euler,
    random_rigid_transform,
    rotation_angle_deg,
)
from apr_tpu.geometry.kabsch import kabsch
from apr_tpu.geometry.robust import est_rigid_robust

__all__ = [
    "apply_transform",
    "compose",
    "inverse",
    "rotation_from_euler",
    "random_rigid_transform",
    "rotation_angle_deg",
    "kabsch",
    "est_rigid_robust",
]
