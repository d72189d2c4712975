"""Flax (linen) network modules for the Timbre-Trap autoencoder.

Re-designed NHWC-native for TPU: activations are laid out (B, F, T, C) so the
channel axis sits on the 128-wide lane dimension and convs map onto the MXU.
The architecture geometry matches the reference exactly (2D conv autoencoder
with frequency-only up/down-sampling and a decoder switch), with reference
citations per block:

* ``ResidualConv2dBlock`` — ``timbre_trap/framework/modules.py:721-777``
* ``EncoderBlock``        — ``modules.py:597-655``
* ``DecoderBlock``        — ``modules.py:658-718``
* ``Encoder``             — ``modules.py:396-483``
* ``Decoder``             — ``modules.py:486-594``
* ``FiLM``                — ``modules.py:842-889``
* decoder-switch channel  — ``modules.py:119-147``
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import ConvTranspose2dTorch

__all__ = [
    "ResidualConv2dBlock",
    "EncoderBlock",
    "DecoderBlock",
    "Encoder",
    "Decoder",
    "FiLM",
    "TimbreTrapNet",
]


def _channel_widths(model_complexity):
    """Filter counts per level (reference modules.py:417-424)."""
    scale = 2 ** (model_complexity - 1)
    return tuple(round(c * scale) for c in (2, 4, 8, 16, 32))


def default_latent_size(model_complexity):
    """Default latent dimensionality (reference modules.py:426-428)."""
    return 32 * 2 ** (model_complexity - 1)


def embedding_sizes(feature_size):
    """Frequency sizes after each of the 4 stride-2 stages, plus padding parity.

    Returns (sizes, paddings): sizes[i] is the frequency extent after stage i;
    paddings is the reversed parity chain the decoder needs
    (reference modules.py:440-446, 520-531).
    """
    sizes, paddings = [], []
    size = feature_size
    for _ in range(4):
        paddings.append(size % 2)
        size = size // 2 - 1
        sizes.append(size)
    paddings.reverse()
    return sizes, paddings


class ResidualConv2dBlock(nn.Module):
    """3x3 dilated conv + ELU -> 1x1 conv + ELU -> residual add."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding="SAME",
                    kernel_dilation=(self.dilation, self.dilation), name="conv1")(x)
        y = nn.elu(y)
        y = nn.Conv(self.channels, (1, 1), name="conv2")(y)
        y = nn.elu(y)
        return y + x


class EncoderBlock(nn.Module):
    """Three residual blocks (dilation 1,2,3) then a frequency-strided conv.

    With ``nchw_boundary`` the block takes/returns (B, C, F, T) instead of
    NHWC: when the block is rematerialized, the tensors saved for the
    backward pass are then the NCHW boundary values, whose natural TPU
    layout is padding-free — NHWC residuals with C<=4 get padded 16x on
    the lane axis and blow out HBM at reference batch/crop sizes.
    """

    out_channels: int
    stride: int = 2
    nchw_boundary: bool = False

    @nn.compact
    def __call__(self, x):
        if self.nchw_boundary:
            x = jnp.transpose(x, (0, 2, 3, 1))
        in_channels = x.shape[-1]
        y = ResidualConv2dBlock(in_channels, 1, name="block1")(x)
        y = ResidualConv2dBlock(in_channels, 2, name="block2")(y)
        y = ResidualConv2dBlock(in_channels, 3, name="block3")(y)
        # Down-sample along frequency only: kernel (2s, 1), stride (s, 1), VALID.
        y = nn.Conv(self.out_channels, (2 * self.stride, 1),
                    strides=(self.stride, 1), padding="VALID", name="sconv")(y)
        y = nn.elu(y)
        if self.nchw_boundary:
            y = jnp.transpose(y, (0, 3, 1, 2))
        return y


class DecoderBlock(nn.Module):
    """Frequency-transposed conv (torch semantics) then residual blocks."""

    out_channels: int
    stride: int = 2
    padding: int = 0  # output_padding along frequency
    nchw_boundary: bool = False  # see EncoderBlock

    @nn.compact
    def __call__(self, x):
        if self.nchw_boundary:
            x = jnp.transpose(x, (0, 2, 3, 1))
        y = ConvTranspose2dTorch(self.out_channels, (2 * self.stride, 1),
                                 strides=(self.stride, 1),
                                 output_padding=(self.padding, 0), name="tconv")(x)
        y = nn.elu(y)
        y = ResidualConv2dBlock(self.out_channels, 1, name="block1")(y)
        y = ResidualConv2dBlock(self.out_channels, 2, name="block2")(y)
        y = ResidualConv2dBlock(self.out_channels, 3, name="block3")(y)
        if self.nchw_boundary:
            y = jnp.transpose(y, (0, 3, 1, 2))
        return y


class Encoder(nn.Module):
    """Spectral coefficients (B, F, T, C_in) -> latents (B, T, D) + embeddings."""

    feature_size: int
    latent_size: Optional[int] = None
    model_complexity: int = 1
    remat: bool = False

    @nn.compact
    def __call__(self, coefficients):
        channels = _channel_widths(self.model_complexity)
        latent = self.latent_size or default_latent_size(self.model_complexity)
        sizes, _ = embedding_sizes(self.feature_size)
        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock

        convin = nn.Conv(channels[0], (3, 3), padding="SAME", name="convin")
        embeddings = []
        if self.remat:
            # convin runs inside a remat cell with NCHW boundaries so the
            # saved residual (the full-resolution input) has a padding-free
            # layout (see EncoderBlock docstring).
            def _convin_nchw(mdl, xc):
                x = jnp.transpose(xc, (0, 2, 3, 1))
                return jnp.transpose(nn.elu(mdl(x)), (0, 3, 1, 2))

            cur = nn.remat(_convin_nchw)(
                convin, jnp.transpose(coefficients, (0, 3, 1, 2)))
            embeddings.append(jnp.transpose(cur, (0, 2, 3, 1)))
        else:
            cur = nn.elu(convin(coefficients))
            embeddings.append(cur)
        for i in range(4):
            cur = block_cls(channels[i + 1], stride=2,
                            nchw_boundary=self.remat, name=f"block{i + 1}")(cur)
            embeddings.append(jnp.transpose(cur, (0, 2, 3, 1))
                              if self.remat else cur)

        # Collapse the remaining frequency extent into the latent dimension.
        latents = nn.Conv(latent, (sizes[-1], 1), padding="VALID", name="convlat")(embeddings[-1])
        latents = jnp.squeeze(latents, axis=1)  # (B, T, D)
        return latents, embeddings


class Decoder(nn.Module):
    """Latents (B, T, D_in) -> spectral logits (B, F, T, C_out)."""

    feature_size: int
    out_channels: int = 2
    model_complexity: int = 1
    remat: bool = False

    @nn.compact
    def __call__(self, latents, encoder_embeddings=None, nchw_out=False):
        channels = _channel_widths(self.model_complexity)[::-1]
        sizes, paddings = embedding_sizes(self.feature_size)
        block_cls = nn.remat(DecoderBlock) if self.remat else DecoderBlock

        # Restore the frequency axis: (B, T, D) -> (B, 1, T, D).
        y = latents[:, None, :, :]
        y = ConvTranspose2dTorch(channels[0], (sizes[-1], 1), name="convin")(y)
        y = nn.elu(y)
        if encoder_embeddings is not None:
            y = y + encoder_embeddings[-1]
        if self.remat:
            y = jnp.transpose(y, (0, 3, 1, 2))
        for i in range(4):
            y = block_cls(channels[i + 1], stride=2, padding=paddings[i],
                          nchw_boundary=self.remat, name=f"block{i + 1}")(y)
            if encoder_embeddings is not None:
                skip = encoder_embeddings[-(i + 2)]
                if self.remat:
                    skip = jnp.transpose(skip, (0, 3, 1, 2))
                y = y + skip
        convout = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                          name="convout")
        if self.remat:
            # Keep convout's saved residual + (optionally) its output NCHW.
            def _convout_nchw(mdl, yc):
                out = mdl(jnp.transpose(yc, (0, 2, 3, 1)))
                return jnp.transpose(out, (0, 3, 1, 2))

            out_nchw = nn.remat(_convout_nchw)(convout, y)
            if nchw_out:
                return out_nchw
            return jnp.transpose(out_nchw, (0, 2, 3, 1))
        out = convout(y)
        if nchw_out:
            return jnp.transpose(out, (0, 3, 1, 2))
        return out


class FiLM(nn.Module):
    """Feature-wise linear modulation conditioned on a one-hot switch."""

    embedding_size: int
    n_conditions: int = 2

    @nn.compact
    def __call__(self, x, condition):
        # x: (B, T, D); condition: (n_conditions,)
        gamma = nn.Dense(self.embedding_size, name="gamma")(condition)
        beta = nn.Dense(self.embedding_size, name="beta")(condition)
        return x * gamma + beta


class TimbreTrapNet(nn.Module):
    """The full autoencoder network (transform-free; pure conv stack).

    ``variant`` selects the reference model family:
      * ``'base'``  — 2-ch real/imag in/out, indicator-channel decoder switch
      * ``'film'``  — 2-ch in/out, FiLM decoder switch (modules.py:780-839)
      * ``'mag'``   — 1-ch magnitude in/out, ReLU output (modules.py:892-992)
      * ``'magdb'`` — 1-ch dB-magnitude in/out, sigmoid output (modules.py:995-1075)
    """

    feature_size: int
    latent_size: Optional[int] = None
    model_complexity: int = 1
    skip_connections: bool = False
    variant: str = "base"
    # Rematerialize encoder/decoder blocks in the backward pass. Needed for
    # flagship-config training: XLA pads the C<=4 residual activations 16x
    # on the lane axis, so saving them all OOMs HBM at reference batch/crop
    # sizes (~30% recompute cost; no effect on inference).
    remat: bool = False

    @property
    def in_channels(self):
        return 1 if self.variant in ("mag", "magdb") else 2

    @property
    def resolved_latent_size(self):
        return self.latent_size or default_latent_size(self.model_complexity)

    def setup(self):
        if self.variant not in ("base", "film", "mag", "magdb"):
            raise ValueError(f"unknown variant {self.variant!r}")
        self.encoder = Encoder(self.feature_size, self.latent_size,
                               self.model_complexity, remat=self.remat)
        self.decoder = Decoder(self.feature_size, self.in_channels,
                               self.model_complexity, remat=self.remat)
        if self.skip_connections:
            # Learnable per-level skip weights, initialized to identity
            # (reference modules.py:61-66).
            self.skip_weights = self.param(
                "skip_weights", nn.initializers.ones, (5,), jnp.float32)
        if self.variant == "film":
            self.film_layer = FiLM(self.resolved_latent_size)

    def encode(self, coefficients):
        """(B, F, T, C_in) -> latents (B, T, D), embeddings, losses dict."""
        latents, embeddings = self.encoder(coefficients)
        return latents, embeddings, {}

    def apply_skip_connections(self, embeddings):
        if self.skip_connections:
            return [self.skip_weights[i] * e for i, e in enumerate(embeddings)]
        return None

    def decode(self, latents, embeddings=None, transcribe=False,
               nchw_out=False):
        """Latents (B, T, D) -> coefficients (B, F, T, C_out).

        ``transcribe`` must be a static Python bool (it selects the graph).
        ``nchw_out`` returns (B, C_out, F, T) instead — used by the training
        step under remat so the saved output residuals stay padding-free.
        """
        if self.variant == "film":
            condition = jnp.asarray(
                [float(transcribe), float(not transcribe)], dtype=jnp.float32)
            latents = self.film_layer(latents, condition)
        else:
            indicator = jnp.full(
                latents.shape[:-1] + (1,), float(not transcribe), latents.dtype)
            latents = jnp.concatenate([latents, indicator], axis=-1)
        coefficients = self.decoder(latents, embeddings, nchw_out)
        if self.variant == "mag":
            coefficients = nn.relu(coefficients)
        elif self.variant == "magdb":
            coefficients = nn.sigmoid(coefficients)
        return coefficients

    def __call__(self, coefficients, consistency=False, nchw_outputs=False):
        """Full training-mode forward on precomputed spectral input.

        Returns (reconstruction, latents, transcription, transcription_rec,
        transcription_scr, losses) — reference ``modules.py:338-393`` — in
        NHWC layout (or NCHW coefficients with ``nchw_outputs``, the
        memory-lean training mode); the transform is applied by the caller,
        ONCE (the reference recomputes the CQT inside forward; we don't).
        """
        latents, embeddings, losses = self.encode(coefficients)
        embeddings = self.apply_skip_connections(embeddings)
        reconstruction = self.decode(latents, embeddings,
                                     nchw_out=nchw_outputs)
        transcription = self.decode(latents, embeddings, True,
                                    nchw_out=nchw_outputs)
        if consistency:
            trn_features = (jnp.transpose(transcription, (0, 2, 3, 1))
                            if nchw_outputs else transcription)
            latents_trn, embeddings_trn, _ = self.encode(trn_features)
            embeddings_trn = self.apply_skip_connections(embeddings_trn)
            transcription_rec = self.decode(latents_trn, embeddings_trn,
                                            nchw_out=nchw_outputs)
            transcription_scr = self.decode(latents_trn, embeddings_trn, True,
                                            nchw_out=nchw_outputs)
        else:
            transcription_rec, transcription_scr = None, None
        return (reconstruction, latents, transcription,
                transcription_rec, transcription_scr, losses)
