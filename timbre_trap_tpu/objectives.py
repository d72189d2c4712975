"""Training objectives as pure JAX functions.

Semantics match the reference exactly (``timbre_trap/framework/objectives.py``):

* reconstruction: elementwise MSE summed over channel+frequency, averaged
  over time+batch (:11-33);
* transcription: MSE with optional per-frame positive-class imbalance
  weighting applied only where the target equals 1 (:36-74);
* consistency: two reconstruction losses of the re-encoded outputs against
  the transcription-coefficient target (:77-104).

All functions accept reference layout ``(B, C, F, T)`` / ``(B, F, T)``.
"""

import jax.numpy as jnp
import numpy as np

__all__ = [
    "compute_reconstruction_loss",
    "compute_transcription_loss",
    "compute_consistency_loss",
]

_EPS = float(np.finfo(np.float32).eps)


def compute_reconstruction_loss(reconstructed, target):
    """Sum squared error over channel/frequency, mean over time/batch."""
    se = jnp.square(reconstructed - target)
    return jnp.mean(jnp.sum(se, axis=(-3, -2)))


def compute_transcription_loss(estimate, target, weight_positive_class=False):
    """MSE over (B, F, T) activations, summed over F, averaged over T/B.

    With ``weight_positive_class``, loss elements at target == 1 are scaled
    by the per-frame negative/positive count ratio.
    """
    loss = jnp.square(estimate - target)
    if weight_positive_class:
        positive_weight = jnp.sum(target, axis=-2, keepdims=True)
        negative_weight = jnp.sum(1.0 - target, axis=-2, keepdims=True)
        positive_scaling = negative_weight / (positive_weight + _EPS)
        scaling = jnp.where(target == 1, positive_scaling, 0.0)
        scaling = jnp.where(scaling == 0, 1.0, scaling)
        loss = loss * scaling
    return jnp.mean(jnp.sum(loss, axis=-2))


def compute_consistency_loss(spectral_coefficients, transcription_coefficients, target):
    """(spectral, transcription) consistency losses vs the coefficient target."""
    consistency_spectral = compute_reconstruction_loss(spectral_coefficients, target)
    consistency_score = compute_reconstruction_loss(transcription_coefficients, target)
    return consistency_spectral, consistency_score
