from apr_tpu.training.batching import PairBatch, make_pair_batch
from apr_tpu.training.trainer import (
    FCGFTrainer,
    TrainState,
    get_trainer,
)

__all__ = [
    "PairBatch",
    "make_pair_batch",
    "FCGFTrainer",
    "TrainState",
    "get_trainer",
]
