from .schedules import cosine_warmup, PlateauDecay
from .step import (
    TrainConfig,
    make_optimizer,
    make_train_step,
    shard_train_step,
    init_train_state,
    grad_norm_telemetry,
)

__all__ = [
    "cosine_warmup",
    "PlateauDecay",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "shard_train_step",
    "init_train_state",
    "grad_norm_telemetry",
]
