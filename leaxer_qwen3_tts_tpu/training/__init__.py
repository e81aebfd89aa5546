"""Training / fine-tuning: teacher-forced loss + sharded optax train step."""

from .loss import LossMetrics, tts_loss
from .train_step import (
    TrainState,
    batch_sharding,
    init_train_state,
    make_optimizer,
    make_train_step,
    shard_train_state,
)

__all__ = [
    "tts_loss",
    "LossMetrics",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "init_train_state",
    "shard_train_state",
    "batch_sharding",
]
