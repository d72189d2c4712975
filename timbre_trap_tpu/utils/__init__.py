from .processing import to_array, debug_nans, filter_non_peaks, threshold
from .experiments import (seed_everything, print_and_log,
                          enable_nan_debugging, MultipitchEvaluator)

__all__ = [
    "to_array",
    "debug_nans",
    "filter_non_peaks",
    "threshold",
    "seed_everything",
    "print_and_log",
    "enable_nan_debugging",
    "MultipitchEvaluator",
]
