from .cache import enable_persistent_compilation_cache
from .processing import to_array, debug_nans, filter_non_peaks, threshold
from .experiments import (seed_everything, print_and_log,
                          enable_nan_debugging, MultipitchEvaluator,
                          sum_gradient_norms, average_gradient_norms,
                          get_max_gradient, get_max_gradient_norm,
                          log_gradient_norms)

__all__ = [
    "enable_persistent_compilation_cache",
    "to_array",
    "debug_nans",
    "filter_non_peaks",
    "threshold",
    "seed_everything",
    "print_and_log",
    "enable_nan_debugging",
    "sum_gradient_norms",
    "average_gradient_norms",
    "get_max_gradient",
    "get_max_gradient_norm",
    "log_gradient_norms",
    "MultipitchEvaluator",
]
