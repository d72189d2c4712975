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
           "sum_gradient_norms", "average_gradient_norms", "get_max_gradient",
           "get_max_gradient_norm", "log_gradient_norms",
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


def _leaf_norms(grads):
    """(path, L2 norm) per parameter leaf of a gradient pytree."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = []
    for path, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        out.append((name, float(np.linalg.norm(np.asarray(leaf).ravel()))))
    return out


def sum_gradient_norms(grads):
    """Cumulative L2 gradient norm across all parameter leaves
    (reference utils/experiments.py:144-169, for pytrees)."""
    return float(sum(n for _, n in _leaf_norms(grads)))


def average_gradient_norms(grads):
    """Average per-leaf L2 gradient norm (reference :172-202)."""
    norms = [n for _, n in _leaf_norms(grads)]
    return float(sum(norms) / max(len(norms), 1))


def get_max_gradient(grads):
    """Maximum absolute gradient entry over all leaves (reference :205-228)."""
    import jax

    leaves = jax.tree.leaves(grads)
    return float(max((np.abs(np.asarray(g)).max() for g in leaves),
                     default=0.0))


def get_max_gradient_norm(grads):
    """Maximum per-leaf L2 gradient norm (reference :231-256)."""
    return float(max((n for _, n in _leaf_norms(grads)), default=0.0))


def log_gradient_norms(grads, writer, i=0, prefix="gradients/norm"):
    """Log every leaf's gradient norm to TensorBoard (reference :259-280)."""
    for name, norm in _leaf_norms(grads):
        writer.add_scalar(f"{prefix}/{name}", norm, i)


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
