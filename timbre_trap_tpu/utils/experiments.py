"""Experiment utilities: seeding, logging, and the multipitch evaluator.

Parity with ``timbre_trap/utils/experiments.py``: ``seed_everything`` (:25-43,
minus CUDA), ``print_and_log`` (:46-64), ``CosineWarmup``-equivalent lives in
``train.schedules``; ``MultipitchEvaluator`` (:283-396) accumulates per-track
results from the in-repo metric suite (``eval/multipitch.py``) instead of
mir_eval, adds the harmonic-mean ``f1-score``, and prefixes keys with
``mpe/``.
"""

import random
import sys
from copy import deepcopy

import numpy as np

from ..eval import multipitch as mp_metrics

__all__ = ["seed_everything", "print_and_log", "enable_nan_debugging",
           "MultipitchEvaluator"]


def enable_nan_debugging(enabled=True):
    """Make every jitted computation fail loudly on NaN/Inf.

    The TPU-native equivalent of the reference's always-on
    ``torch.autograd.set_detect_anomaly(True)`` (train.py:362) and
    ``debug_nans`` helper (utils/processing.py:36-63): JAX re-runs the
    offending primitive un-jitted and points at it.
    """
    import jax

    jax.config.update("jax_debug_nans", enabled)
    jax.config.update("jax_debug_infs", enabled)


def seed_everything(seed):
    """Seed host RNGs and return a JAX PRNG key for device randomness.

    Device-side randomness in JAX is explicit (keys are threaded through),
    so unlike the reference there is no hidden global GPU state to pin.
    """
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def print_and_log(text, path=None):
    """Print to console and optionally append to a log file."""
    print(text)
    if path is not None:
        with open(path, "a") as f:
            print(text, file=f)


class MultipitchEvaluator:
    """Accumulate per-track MPE results and compute mean / std statistics."""

    def __init__(self, tolerance=0.5):
        self.tolerance = tolerance
        self.results = None
        self.reset_results()

    def reset_results(self):
        self.results = {}

    def append_results(self, results):
        for key, value in results.items():
            if key in self.results:
                self.results[key] = np.append(self.results[key], value)
            else:
                self.results[key] = np.array([value])

    def average_results(self):
        mean = deepcopy(self.results)
        std_dev = deepcopy(self.results)
        for key in self.results:
            mean[key] = round(float(np.mean(mean[key])), 5)
            std_dev[key] = round(float(np.std(std_dev[key])), 5)
        return mean, std_dev

    def evaluate(self, times_est, multi_pitch_est, times_ref, multi_pitch_ref):
        """Compute MPE results for one track's estimates vs ground truth."""
        results = mp_metrics.evaluate(times_ref, multi_pitch_ref,
                                      times_est, multi_pitch_est,
                                      window=self.tolerance)
        results = {k.lower(): results[k] for k in results.keys()}
        pr, rc = results["precision"], results["recall"]
        results["f1-score"] = 2 * pr * rc / (pr + rc + sys.float_info.epsilon)
        return {f"mpe/{k}": v for k, v in results.items()}
