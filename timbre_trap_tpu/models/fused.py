"""Fused-kernel forward path for the Timbre-Trap model families.

Executes the whole autoencoder in the packed f-major layout
(``ops/packed_conv.py``): convin is fused into the first encoder level and
convout into the last decoder level (``ops/fused_level.py``), while the
latent-boundary convs — ``convlat`` (kernel ``(E,1)``, reference
``modules.py:440-446``) and the decoder ``convin`` ConvTranspose (kernel
``(E,1)``, ``modules.py:533-536``) — are dense matmuls over the packed row
axis. The only layout changes in the entire forward are one pack at entry
and one unpack at exit.

Semantics match ``TimbreTrapNet`` (``models/modules.py``) exactly; the
decoder switch (indicator channel / FiLM) follows ``modules.py:119-147``
and ``:780-839``. Skip connections are not supported here (the flagship
configuration ships without them, ``experiments/train.py:101``) — callers
fall back to the flax path when they are enabled.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fused_level import (decoder_level_spec, encoder_level_spec,
                               fused_level_apply)
from ..ops.packed_conv import pack_nhwc
from .modules import _channel_widths, embedding_sizes

__all__ = ["fused_forward", "fused_supported"]


def fused_supported(net):
    """Whether the fused path covers this network configuration."""
    return not net.skip_connections


def _latent_matmuls(params, net):
    """convlat (dense over packed rows) and decoder convin (dense expand)."""
    clat = params["encoder"]["convlat"]
    kh, kw, c_in, latent = clat["kernel"].shape
    w_lat = clat["kernel"].reshape(kh * c_in, latent)  # f-major rows
    b_lat = clat["bias"]

    cin = params["decoder"]["convin"]
    khd, kwd, d_in, c0 = cin["kernel"].shape
    # ConvTranspose (E,1) on F=1 input: y[f, co] = sum_i x[i] K[f, 0, i, co]
    w_dec = jnp.transpose(cin["kernel"][:, 0], (0, 2, 1)).reshape(
        khd * c0, d_in)  # (R_mid, D_in), f-major rows
    b_dec = jnp.tile(cin["bias"], khd)
    return w_lat, b_lat, w_dec, b_dec


def fused_forward(params, net, features, transcribe, dtype=jnp.float32,
                  interpret=False):
    """Features (B, F, T, C_in) -> coefficients (B, C_out, F, T) NCHW.

    One decoder pass (``transcribe`` selects the switch). ``dtype`` is the
    fused-kernel activation storage type (f32 exact / bf16 fast).
    """
    feature_size = net.feature_size
    complexity = net.model_complexity
    channels = _channel_widths(complexity)
    sizes, paddings = embedding_sizes(feature_size)
    enc = params["encoder"]
    dec = params["decoder"]

    x = pack_nhwc(features).astype(dtype)
    # In f32 mode the fused path is exact (5e-7 vs true fp32 per level on
    # v5e); keep the latent-boundary matmuls at full precision too — the
    # TPU default multiplies in bf16, and the decoder amplifies latent
    # noise. bf16 mode keeps the fast default.
    precision = ("highest" if jnp.dtype(dtype) == jnp.float32 else "default")

    # Encoder: convin fused into level 1.
    f = feature_size
    for i in range(4):
        spec = encoder_level_spec(
            enc[f"block{i + 1}"], f,
            convin_params=enc["convin"] if i == 0 else None)
        x = fused_level_apply(x, spec, dtype=dtype, interpret=interpret)
        f = sizes[i]

    # Latent boundary (dense matmuls on packed rows).
    w_lat, b_lat, w_dec, b_dec = _latent_matmuls(params, net)
    latents = jnp.einsum("rl,brt->blt", w_lat, x.astype(jnp.float32),
                         precision=precision,
                         preferred_element_type=jnp.float32)
    latents = latents + b_lat[None, :, None]

    # Decoder switch (reference modules.py:119-147 / :780-839).
    if net.variant == "film":
        cond = jnp.asarray([float(transcribe), float(not transcribe)],
                           jnp.float32)
        film = params["film_layer"]
        gamma = film["gamma"]["kernel"].T @ cond + film["gamma"]["bias"]
        beta = film["beta"]["kernel"].T @ cond + film["beta"]["bias"]
        latents = latents * gamma[None, :, None] + beta[None, :, None]
    else:
        indicator = jnp.full((latents.shape[0], 1, latents.shape[2]),
                             float(not transcribe), latents.dtype)
        latents = jnp.concatenate([latents, indicator], axis=1)

    y = jnp.einsum("ri,bit->brt", w_dec, latents, precision=precision,
                   preferred_element_type=jnp.float32)
    y = jax.nn.elu(y + b_dec[None, :, None]).astype(dtype)

    # Decoder: convout fused into level 4.
    f = sizes[-1]
    for i in range(4):
        spec = decoder_level_spec(
            dec[f"block{i + 1}"], f, output_padding=paddings[i],
            convout_params=dec["convout"] if i == 3 else None)
        y = fused_level_apply(y, spec, dtype=dtype, interpret=interpret)
        f = spec.items[0][1].f_out

    # Unpack (B, F*C_out, T) f-major -> NCHW (B, C_out, F, T).
    b, r, t = y.shape
    c_out = net.in_channels
    out = jnp.transpose(y.reshape(b, feature_size, c_out, t),
                        (0, 2, 1, 3)).astype(jnp.float32)
    if net.variant == "mag":
        out = jax.nn.relu(out)
    elif net.variant == "magdb":
        out = jax.nn.sigmoid(out)
    return out
