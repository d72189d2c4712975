"""timbre_trap_tpu — a TPU-native (JAX/XLA/Pallas) music-transcription framework.

A from-scratch rebuild of the capabilities of sony/timbre-trap: an invertible
sliCQ/CQT time-frequency transform, a 2D-convolutional autoencoder with a
decoder switch emitting either reconstruction or transcription coefficients,
joint training objectives, a dataset zoo, and evaluation tooling — designed
for TPU from the ground up (static shapes, gather-based transforms, shard_map
data parallelism over a device mesh).
"""

__version__ = "0.1.0"

from . import transform

__all__ = ["transform", "__version__"]


def __getattr__(name):
    # Lazy submodule access to keep `import timbre_trap_tpu` light.
    if name in ("models", "objectives", "ops", "data", "train", "eval",
                "parallel", "utils", "interop"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
