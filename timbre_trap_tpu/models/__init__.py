from .modules import (
    ResidualConv2dBlock,
    EncoderBlock,
    DecoderBlock,
    Encoder,
    Decoder,
    FiLM,
    TimbreTrapNet,
)
from .timbre_trap import (TimbreTrap, TimbreTrapFiLM, TimbreTrapMag,
                          TimbreTrapMagDB, load_model)

__all__ = [
    "ResidualConv2dBlock",
    "EncoderBlock",
    "DecoderBlock",
    "Encoder",
    "Decoder",
    "FiLM",
    "TimbreTrapNet",
    "TimbreTrap",
    "TimbreTrapFiLM",
    "TimbreTrapMag",
    "TimbreTrapMagDB",
    "load_model",
]
