"""Convolution helpers with exact reference geometry.

The reference model (``timbre_trap/framework/modules.py``) relies on specific
PyTorch Conv2d/ConvTranspose2d shape semantics — in particular the
``output_padding`` parity chain that makes the decoder exactly mirror the
encoder's ``F // 2 - 1`` frequency contractions (``modules.py:520-541``).
This module provides an NHWC ConvTranspose with those exact semantics
(torch: ``out = (in - 1) * stride + kernel + output_padding`` at zero
padding), built on ``lax.conv_general_dilated``; it is also the layer the
torch-weight importer maps onto.
"""

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

__all__ = ["ConvTranspose2dTorch"]


class ConvTranspose2dTorch(nn.Module):
    """NHWC transposed 2D convolution with PyTorch shape semantics.

    Equivalent to ``torch.nn.ConvTranspose2d(in, features, kernel_size,
    stride, padding=0, output_padding)`` applied to NCHW data, for NHWC data.
    Implemented as an input-dilated correlation with a spatially flipped
    kernel: ``out = (in - 1) * stride + kernel + output_padding``.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    output_padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = self.strides
        oph, opw = self.output_padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((kh - 1, kh - 1 + oph), (kw - 1, kw - 1 + opw)),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias
