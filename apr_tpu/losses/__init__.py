from apr_tpu.losses.contrastive import (
    hardest_contrastive_loss,
    contrastive_loss_random_negatives,
    triplet_loss,
)
from apr_tpu.losses.generative import (
    offset_regularization,
    npr_reconstruction,
)

__all__ = [
    "hardest_contrastive_loss",
    "contrastive_loss_random_negatives",
    "triplet_loss",
    "offset_regularization",
    "npr_reconstruction",
]
