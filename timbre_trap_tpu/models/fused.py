"""Packed-layout forward paths for the Timbre-Trap model families.

Executes the autoencoder in the packed f-major layout
(``ops/packed_conv.py``): convin is fused into the first encoder level and
convout into the last decoder level, while the latent-boundary convs —
``convlat`` (kernel ``(E,1)``, reference ``modules.py:440-446``) and the
decoder ``convin`` ConvTranspose (``modules.py:533-536``) — are dense
matmuls over the packed row axis. The only layout changes in the entire
forward are one pack at entry and one unpack at exit.

Two conv backends execute the same banded level specs:

* ``"pallas"`` — the fused VMEM kernels (``ops/fused_level.py``); the fast
  inference path (bf16 storage ~4.6x the XLA conv stack on v5e; f32 exact).
* ``"xla"``   — plain banded einsums (``packed_conv_reference``); fully
  differentiable, so it is the TRAINING path: activations and transients
  are (B, R~2048, T) with no lane-padding anywhere, where the NHWC/NCHW
  flax path materializes 16x-padded conv temps that blow HBM at the
  reference batch (8 x 9-s crops, train.py:39-101).

Semantics match ``TimbreTrapNet`` (``models/modules.py``); the decoder
switch (indicator channel / FiLM) follows ``modules.py:119-147`` and
``:780-839``. Skip connections are not supported here (the flagship
configuration ships without them, ``experiments/train.py:101``) — callers
fall back to the flax path when they are enabled.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fused_level import (decoder_level_spec, encoder_level_spec,
                               fused_level_apply, make_fused_level_train,
                               packed_level_apply_xla)
from ..ops.packed_conv import pack_nhwc
from .modules import embedding_sizes

__all__ = ["fused_forward", "fused_supported", "packed_train_forward",
           "packed_to_nchw"]


def fused_supported(net):
    """Whether the packed paths cover this network configuration."""
    return not net.skip_connections


def packed_to_nchw(y, feature_size, channels):
    """(B, F*C, T) f-major -> (B, C, F, T)."""
    b, r, t = y.shape
    return jnp.transpose(y.reshape(b, feature_size, channels, t), (0, 2, 1, 3))


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


def _apply_level(x, spec, backend, dtype, interpret, remat, mesh=None):
    if backend == "pallas":
        fn = partial(fused_level_apply, spec=spec, dtype=dtype,
                     interpret=interpret)
    elif backend == "pallas_train":
        # Differentiable fused level: Pallas forward + Pallas backward
        # (adjoint banded blocks); residuals are just the level input, so no
        # outer jax.checkpoint is needed.
        train_fn = make_fused_level_train(spec, interpret=interpret)
        arrays = (spec.weight_arrays(jnp.float32)
                  + spec.adjoint_arrays(jnp.float32))
        if mesh is not None:
            # Data-parallel composition: batch is the pallas grid's leading
            # axis, so each device runs its own grid on its batch shard with
            # the (replicated) weight arrays. shard_map's transpose psums
            # the replicated inputs' cotangents, so parameter gradients come
            # out globally summed exactly as in the jit-sharded XLA paths
            # (SURVEY.md §2.6; DataParallel at reference train.py:166-168).
            from jax.sharding import PartitionSpec as P

            axis = mesh.axis_names[0]
            train_fn = jax.shard_map(
                train_fn, mesh=mesh,
                in_specs=(P(axis),) + (P(),) * len(arrays),
                out_specs=P(axis), check_vma=False)
        return train_fn(x, *arrays)
    else:
        fn = partial(packed_level_apply_xla, spec=spec)
    if remat:
        fn = jax.checkpoint(fn)
    return fn(x)


def encode_packed(params, net, x, backend="pallas", dtype=jnp.float32,
                  precision="default", interpret=False, remat=False,
                  mesh=None):
    """Packed features (B, F*C_in, T) -> latents (B, D, T)."""
    sizes, _ = embedding_sizes(net.feature_size)
    enc = params["encoder"]
    adj = backend == "pallas_train"
    f = net.feature_size
    for i in range(4):
        spec = encoder_level_spec(
            enc[f"block{i + 1}"], f,
            convin_params=enc["convin"] if i == 0 else None,
            with_adjoints=adj)
        x = _apply_level(x, spec, backend, dtype, interpret, remat, mesh)
        f = sizes[i]
    w_lat, b_lat, _, _ = _latent_matmuls(params, net)
    latents = jnp.einsum("rl,brt->blt", w_lat, x.astype(jnp.float32),
                         precision=precision,
                         preferred_element_type=jnp.float32)
    return latents + b_lat[None, :, None]


def decode_packed(params, net, latents, transcribe, backend="pallas",
                  dtype=jnp.float32, precision="default", interpret=False,
                  remat=False, mesh=None):
    """Latents (B, D, T) -> packed coefficients (B, F*C_out, T).

    Applies the decoder switch (reference modules.py:119-147 / :780-839)
    and the variant output activation (relu/sigmoid) in packed space.
    """
    sizes, paddings = embedding_sizes(net.feature_size)
    dec = params["decoder"]
    _, _, w_dec, b_dec = _latent_matmuls(params, net)

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

    f = sizes[-1]
    adj = backend == "pallas_train"
    for i in range(4):
        spec = decoder_level_spec(
            dec[f"block{i + 1}"], f, output_padding=paddings[i],
            convout_params=dec["convout"] if i == 3 else None,
            with_adjoints=adj)
        y = _apply_level(y, spec, backend, dtype, interpret, remat, mesh)
        f = spec.items[0][1].f_out

    y = y.astype(jnp.float32)
    if net.variant == "mag":
        y = jax.nn.relu(y)
    elif net.variant == "magdb":
        y = jax.nn.sigmoid(y)
    return y


def fused_forward(params, net, features, transcribe, dtype=jnp.float32,
                  interpret=False):
    """Features (B, F, T, C_in) -> coefficients (B, C_out, F, T) NCHW.

    The fast inference path (Pallas backend). In f32 mode the fused path is
    exact (83 dB vs a true-fp32 ground truth on v5e, where the flax/XLA
    path's default bf16 multiplies land at ~16 dB on an untrained decoder),
    so the latent matmuls run at full precision too; bf16 keeps the fast
    defaults throughout.
    """
    precision = ("highest" if jnp.dtype(dtype) == jnp.float32 else "default")
    x = pack_nhwc(features).astype(dtype)
    latents = encode_packed(params, net, x, "pallas", dtype, precision,
                            interpret)
    y = decode_packed(params, net, latents, transcribe, "pallas", dtype,
                      precision, interpret)
    return packed_to_nchw(y, net.feature_size, net.in_channels)


def packed_train_forward(params, net, features, consistency, backend="xla",
                         remat=True, interpret=False, mesh=None):
    """Training-mode forward on packed tensors.

    Returns (reconstruction, latents, transcription, transcription_rec,
    transcription_scr) with all coefficients PACKED (B, F*C, T) — the same
    quantities as ``TimbreTrapNet.__call__`` (reference modules.py:338-393)
    in the padding-free layout. ``remat`` checkpoints each level so only
    packed level inputs are saved for the backward pass.
    """
    kw = dict(backend=backend, dtype=jnp.float32, precision="default",
              interpret=interpret, remat=remat, mesh=mesh)
    x = pack_nhwc(features)
    latents = encode_packed(params, net, x, **kw)
    reconstruction = decode_packed(params, net, latents, False, **kw)
    transcription = decode_packed(params, net, latents, True, **kw)
    if consistency:
        latents_t = encode_packed(params, net, transcription, **kw)
        trn_rec = decode_packed(params, net, latents_t, False, **kw)
        trn_scr = decode_packed(params, net, latents_t, True, **kw)
    else:
        trn_rec, trn_scr = None, None
    return reconstruction, latents, transcription, trn_rec, trn_scr
