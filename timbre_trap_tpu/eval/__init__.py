from . import multipitch
from .multipitch import resample_multipitch, MAX_FREQ, MIN_FREQ
from .sdr import signal_distortion_ratio

__all__ = ["multipitch", "evaluate", "resample_multipitch",
           "signal_distortion_ratio", "MAX_FREQ", "MIN_FREQ",
           "quality_f1", "synthesize_polyphony"]


def __getattr__(name):
    # Lazy: eval.evaluate/quality pull in the data/model stacks, which
    # themselves use utils -> eval.multipitch; deferring breaks the cycle.
    if name == "evaluate":
        from .evaluation import evaluate

        return evaluate
    if name in ("quality_f1", "synthesize_polyphony"):
        from . import quality

        return getattr(quality, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
