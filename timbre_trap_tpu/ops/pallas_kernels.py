"""Pallas TPU kernels for activation post-processing.

``peak_mask_pallas`` fuses the evaluation post-process — strict vertical
(frequency-axis) local-maximum detection + thresholding — into one VMEM
pass over (F, T) activation tiles: each grid step loads a (F, Tt) tile,
compares against its up/down shifts on the sublane axis, and writes the
binary mask. Functionally identical to ``ops.peaks.peak_mask`` (which XLA
executes as several elementwise kernels with HBM round trips in between).

Runs compiled on TPU; interpret mode elsewhere (tests exercise both paths
via the interpret flag).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["peak_mask_pallas"]

_TILE_T = 512


def _kernel(x_ref, t_ref, o_ref):
    x = x_ref[:]                       # (F, Tt) activations
    t = t_ref[0]                       # threshold scalar
    f = x.shape[0]
    zeros = jnp.zeros((1, x.shape[1]), x.dtype)
    up = jnp.concatenate([zeros, x[:-1, :]], axis=0)    # row above
    down = jnp.concatenate([x[1:, :], zeros], axis=0)   # row below
    is_peak = (x > up) & (x > down)
    o_ref[:] = ((is_peak & (x >= t))).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def peak_mask_pallas(activations, t=0.5, interpret=False):
    """(..., F, T) activations -> uint8 peaks-then-threshold mask."""
    a = jnp.asarray(activations, jnp.float32)
    batch_shape = a.shape[:-2]
    F, T = a.shape[-2:]
    a2 = a.reshape((-1, F, T))
    pad_t = -T % _TILE_T
    if pad_t:
        a2 = jnp.pad(a2, ((0, 0), (0, 0), (0, pad_t)))
    Tp = T + pad_t
    thresh = jnp.asarray([t], jnp.float32)

    def one(x):
        return pl.pallas_call(
            _kernel,
            grid=(Tp // _TILE_T,),
            in_specs=[
                pl.BlockSpec((F, _TILE_T), lambda i: (0, i),
                             memory_space=pltpu.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((F, _TILE_T), lambda i: (0, i),
                                   memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, Tp), jnp.uint8),
            interpret=interpret,
        )(x, thresh)

    out = jax.vmap(one)(a2)
    return out[..., :T].reshape(*batch_shape, F, T)
