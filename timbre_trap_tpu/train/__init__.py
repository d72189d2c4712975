from .schedules import cosine_warmup, PlateauDecay
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint, load_params
from .loop import TrainerConfig, Trainer
from .step import (
    TRAIN_AUDIO_SCALE,
    compact_audio,
    compact_ground_truth,
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
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "load_params",
    "TrainerConfig",
    "Trainer",
    "TRAIN_AUDIO_SCALE",
    "compact_audio",
    "compact_ground_truth",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "shard_train_step",
    "init_train_state",
    "grad_norm_telemetry",
]
