"""Device-side activation post-processing (peak-picking, thresholding).

Same semantics as the numpy versions in ``utils/processing.py`` (strict
vertical local maxima vs zero-padded edges; binarize at t), but running on
the accelerator so evaluation only transfers a bit-packed binary mask
instead of full float activations — host transfers are the eval bottleneck
on tunneled TPU runtimes.
"""

import jax
import jax.numpy as jnp

__all__ = ["filter_non_peaks", "threshold", "peak_mask"]


def filter_non_peaks(activations):
    """Zero non-peaks along the second-to-last (frequency) axis."""
    a = jnp.asarray(activations)
    pad = [(0, 0)] * (a.ndim - 2) + [(1, 1), (0, 0)]
    p = jnp.pad(a, pad)
    above_prev = p[..., 1:-1, :] > p[..., :-2, :]
    above_next = p[..., 1:-1, :] > p[..., 2:, :]
    return jnp.where(above_prev & above_next, a, 0.0)


def threshold(activations, t=0.5):
    """Binarize at ``t`` (values >= t become 1)."""
    return (jnp.asarray(activations) >= t).astype(jnp.float32)


@jax.jit
def _peak_mask_xla(activations, t=0.5):
    return threshold(filter_non_peaks(activations), t).astype(jnp.uint8)


def peak_mask(activations, t=0.5):
    """Fused peaks-then-threshold -> uint8 mask (the eval post-process).

    On TPU this runs as a single Pallas kernel (one VMEM pass; measured
    1.4x the XLA composition); elsewhere the XLA formulation is used.
    """
    if jax.default_backend() != "cpu":
        from .pallas_kernels import peak_mask_pallas

        return peak_mask_pallas(activations, t)
    return _peak_mask_xla(activations, t)
