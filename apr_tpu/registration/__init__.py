from apr_tpu.registration.matching import (
    feature_nn_correspondences,
    mutual_nn_correspondences,
    gt_correspondences,
)
from apr_tpu.registration.ransac import ransac_pose, RansacResult
from apr_tpu.registration.metrics import (
    registration_errors,
    registration_success,
    hit_ratio,
    corr_dist,
)

__all__ = [
    "feature_nn_correspondences",
    "mutual_nn_correspondences",
    "gt_correspondences",
    "ransac_pose",
    "RansacResult",
    "registration_errors",
    "registration_success",
    "hit_ratio",
    "corr_dist",
]
