from . import multipitch
from .multipitch import resample_multipitch, MAX_FREQ, MIN_FREQ
from .sdr import signal_distortion_ratio

__all__ = ["multipitch", "evaluate", "resample_multipitch",
           "signal_distortion_ratio", "MAX_FREQ", "MIN_FREQ"]


def __getattr__(name):
    # Lazy: eval.evaluate pulls in the data/model stacks, which themselves
    # use utils -> eval.multipitch; deferring breaks the import cycle.
    if name == "evaluate":
        from .evaluation import evaluate

        return evaluate
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
