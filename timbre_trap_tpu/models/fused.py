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
``:780-839``. Skip connections (reference ``modules.py:61-66, 338-393``)
are supported in every backend: the skip adds land on level *boundaries*
(each level is its own kernel/einsum call), so with skips enabled convin
and convout simply run as standalone one-conv "levels" instead of being
fused into the first/last level, and the scaled encoder embeddings are
added between level calls in plain jnp (differentiable, mesh-shardable).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.fused_level import (LevelSpec, decoder_level_spec,
                               encoder_level_spec, fuse_level_specs,
                               fused_level_apply, make_fused_level_train,
                               packed_level_apply_xla)
from ..ops.packed_conv import build_dense_blocks, pack_nhwc
from .modules import embedding_sizes

__all__ = ["fused_forward", "fused_supported", "packed_train_forward",
           "packed_to_nchw"]

# r5: inference level fusion (docs/PERFORMANCE.md "whole-stack fusion").
#   "full"  — fused_forward runs the ENTIRE forward as ONE Pallas kernel:
#             encoder levels + convlat + (conditioning-folded) decoder
#             expansion + decoder levels chain as one item list; only the
#             packed input and output touch HBM. The decoder switch is a
#             constant per branch, so it folds into the dense expansion's
#             weights/bias (indicator column -> bias; FiLM -> column
#             scales + bias) — exact in real math.
#   True    — one whole-encoder + one whole-decoder kernel (also what the
#             standalone encode/decode APIs use under "full").
#   False   — per-level kernels (the r4 path).
# Module-level so tools/mega_fusion_ab.py can A/B the settings; the
# TT_TPU_FUSE env var ("full"/"stack"/"per-level") overrides the default
# at import time — the escape hatch when the one-time full-kernel Mosaic
# compile (docs/PERFORMANCE.md "whole-stack fusion") is unwanted, e.g.
# cold-cache one-shot runs.
FUSE_INFERENCE_LEVELS = {"full": "full", "stack": True,
                         "per-level": False}[
    os.environ.get("TT_TPU_FUSE", "full")]


def fused_supported(net):
    """Whether the packed paths cover this network configuration.

    Always true since round 3 (skip connections run on the packed paths
    too); kept as an API seam for future configurations.
    """
    return True


def _conv2d_level_spec(conv_params, f, act, with_adjoints=False):
    """A one-item LevelSpec running a single SAME 3x3 conv (+ optional ELU).

    Used when skip connections unfuse convin/convout from their levels so
    the post-convin embedding / pre-convout skip add are level boundaries.
    """
    from ..ops.fused_level import LevelSpec, _attach_conv2d_adjoint
    from ..ops.packed_conv import build_conv2d_blocks

    cb = build_conv2d_blocks(conv_params["kernel"], conv_params["bias"], f, 1,
                             vjp_einsum=with_adjoints)
    if with_adjoints:
        _attach_conv2d_adjoint(cb, conv_params["kernel"], f, 1)
    return LevelSpec([("conv", cb, act)], cb.r_in)


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


def _apply_level(x, spec, backend, dtype, interpret, remat, mesh=None,
                 tile_t=None):
    if backend == "pallas":
        fn = partial(fused_level_apply, spec=spec, dtype=dtype,
                     interpret=interpret)
    elif backend == "pallas_train":
        # Differentiable fused level: Pallas forward + Pallas backward
        # (adjoint banded blocks); residuals are just the level input, so no
        # outer jax.checkpoint is needed. ``dtype=bfloat16`` selects the
        # mixed-precision mode (bf16 storage/operands, f32 accumulation).
        # ``tile_t`` overrides the measured training defaults (512 bf16 /
        # 384 f32; see ops/fused_level.default_train_tile_t) e.g. for
        # geometries whose backward slabs exceed VMEM at wide tiles.
        train_fn = make_fused_level_train(spec, tile_t=tile_t,
                                          interpret=interpret, dtype=dtype)
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
                  mesh=None, with_embeddings=False, tile_t=None):
    """Packed features (B, F*C_in, T) -> latents (B, D, T).

    With ``with_embeddings`` (the skip-connection path) returns
    ``(latents, embeddings)`` where embeddings are the 5 packed level
    boundaries the flax encoder collects (after convin+ELU, then after
    each of the 4 levels — reference ``modules.py:455-481``); convin then
    runs as its own one-conv level instead of fused into level 1.
    """
    sizes, _ = embedding_sizes(net.feature_size)
    enc = params["encoder"]
    adj = backend == "pallas_train"
    f = net.feature_size
    embeddings = []
    if with_embeddings:
        spec_in = _conv2d_level_spec(enc["convin"], f, act=True,
                                     with_adjoints=adj)
        x = _apply_level(x, spec_in, backend, dtype, interpret, remat,
                         mesh, tile_t)
        embeddings.append(x)
    specs = []
    for i in range(4):
        specs.append(encoder_level_spec(
            enc[f"block{i + 1}"], f,
            convin_params=(enc["convin"]
                           if i == 0 and not with_embeddings else None),
            with_adjoints=adj))
        f = sizes[i]
    if backend == "pallas" and not with_embeddings and FUSE_INFERENCE_LEVELS:
        # Inference: ONE whole-encoder kernel — no level boundaries touch
        # HBM (ops/fused_level.fuse_level_specs; r5, measured on-chip).
        # Skip mode keeps per-level calls: the embeddings ARE the
        # boundaries. Training keeps per-level custom-VJP kernels: the
        # backward stashes every item's input slab in VMEM, which only
        # fits at per-level granularity.
        x = _apply_level(x, fuse_level_specs(specs), backend, dtype,
                         interpret, remat, mesh, tile_t)
    else:
        for spec in specs:
            x = _apply_level(x, spec, backend, dtype, interpret, remat,
                             mesh, tile_t)
            if with_embeddings:
                embeddings.append(x)
    w_lat, b_lat, _, _ = _latent_matmuls(params, net)
    latents = jnp.einsum("rl,brt->blt", w_lat, x.astype(jnp.float32),
                         precision=precision,
                         preferred_element_type=jnp.float32)
    latents = latents + b_lat[None, :, None]
    if with_embeddings:
        return latents, embeddings
    return latents


def _condition_latents(params, net, latents, transcribe):
    """Apply the decoder switch (reference modules.py:119-147 / :780-839)."""
    if net.variant == "film":
        cond = jnp.asarray([float(transcribe), float(not transcribe)],
                           jnp.float32)
        film = params["film_layer"]
        gamma = film["gamma"]["kernel"].T @ cond + film["gamma"]["bias"]
        beta = film["beta"]["kernel"].T @ cond + film["beta"]["bias"]
        return latents * gamma[None, :, None] + beta[None, :, None]
    indicator = jnp.full((latents.shape[0], 1, latents.shape[2]),
                         float(not transcribe), latents.dtype)
    return jnp.concatenate([latents, indicator], axis=1)


def decode_packed(params, net, latents, transcribe, backend="pallas",
                  dtype=jnp.float32, precision="default", interpret=False,
                  remat=False, mesh=None, skips=None, tile_t=None):
    """Latents (B, D, T) -> packed coefficients (B, F*C_out, T).

    Applies the decoder switch (reference modules.py:119-147 / :780-839)
    and the variant output activation (relu/sigmoid) in packed space.
    ``skips``: the 5 *scaled* packed encoder embeddings (skip-connection
    mode) — added exactly where the flax decoder adds them (after the
    latent expansion and after each level, ``modules.py:196-207``), with
    convout unfused from level 4 so the final add precedes it.

    ``transcribe`` may be a bool (one branch, batch B) or a tuple of bools
    (the branches are stacked on the batch axis — ``latents`` arrives
    pre-tiled at ``len(transcribe) * B`` — and every decoder level runs
    ONE sweep for all branches; see ``packed_train_forward``'s
    ``batch_pairs``).
    """
    sizes, paddings = embedding_sizes(net.feature_size)
    dec = params["decoder"]
    _, _, w_dec, b_dec = _latent_matmuls(params, net)

    if isinstance(transcribe, (tuple, list)):
        n_br = len(transcribe)
        b_each = latents.shape[0] // n_br
        latents = jnp.concatenate(
            [_condition_latents(params, net,
                                latents[i * b_each:(i + 1) * b_each], tr)
             for i, tr in enumerate(transcribe)], axis=0)
    else:
        latents = _condition_latents(params, net, latents, transcribe)

    y = jnp.einsum("ri,bit->brt", w_dec, latents, precision=precision,
                   preferred_element_type=jnp.float32)
    y = jax.nn.elu(y + b_dec[None, :, None]).astype(dtype)
    if skips is not None and latents.shape[0] != skips[4].shape[0]:
        # Stacked-branch mode: the skip embeddings are per-sample, shared
        # by every branch — tile them to the stacked batch.
        reps = latents.shape[0] // skips[4].shape[0]
        skips = [jnp.concatenate([s] * reps, axis=0) for s in skips]
    if skips is not None:
        y = (y.astype(jnp.float32) + skips[4].astype(jnp.float32)
             ).astype(dtype)

    f = sizes[-1]
    adj = backend == "pallas_train"
    specs = []
    for i in range(4):
        specs.append(decoder_level_spec(
            dec[f"block{i + 1}"], f, output_padding=paddings[i],
            convout_params=(dec["convout"]
                            if i == 3 and skips is None else None),
            with_adjoints=adj))
        f = specs[-1].items[0][1].f_out
    if backend == "pallas" and skips is None and FUSE_INFERENCE_LEVELS:
        # Inference: ONE whole-decoder kernel (see encode_packed; skip
        # mode needs the per-level boundaries for its adds).
        y = _apply_level(y, fuse_level_specs(specs), backend, dtype,
                         interpret, remat, mesh, tile_t)
    else:
        for i, spec in enumerate(specs):
            y = _apply_level(y, spec, backend, dtype, interpret, remat,
                             mesh, tile_t)
            if skips is not None:
                y = (y.astype(jnp.float32) + skips[3 - i].astype(jnp.float32)
                     ).astype(dtype)
    if skips is not None:
        spec_out = _conv2d_level_spec(dec["convout"], f, act=False,
                                      with_adjoints=adj)
        y = _apply_level(y, spec_out, backend, dtype, interpret, remat,
                         mesh, tile_t)

    y = y.astype(jnp.float32)
    if net.variant == "mag":
        y = jax.nn.relu(y)
    elif net.variant == "magdb":
        y = jax.nn.sigmoid(y)
    return y


def _inference_specs(params, net):
    """(encoder specs, decoder specs) for the no-skip inference path."""
    sizes, paddings = embedding_sizes(net.feature_size)
    enc, dec = params["encoder"], params["decoder"]
    especs, f = [], net.feature_size
    for i in range(4):
        especs.append(encoder_level_spec(
            enc[f"block{i + 1}"], f,
            convin_params=enc["convin"] if i == 0 else None))
        f = sizes[i]
    dspecs, f = [], sizes[-1]
    for i in range(4):
        dspecs.append(decoder_level_spec(
            dec[f"block{i + 1}"], f, output_padding=paddings[i],
            convout_params=dec["convout"] if i == 3 else None))
        f = dspecs[-1].items[0][1].f_out
    return especs, dspecs


def _latent_bridge_spec(params, net, transcribe):
    """convlat + conditioned decoder expansion as two dense kernel items.

    The decoder switch is CONSTANT per inference branch, so it folds into
    the dense expansion (reference ``modules.py:119-147``): the indicator
    channel (a constant row v = float(not transcribe) concatenated after
    the latents) contributes ``v * W[:, -1]`` to the bias; FiLM
    (``modules.py:780-839``) is affine on the latents, so
    ``W (gamma x + beta) + b == (W*gamma) x + (W beta + b)``. Exact in
    real math — only f32 rounding reassociates.
    """
    w_lat, b_lat, w_dec, b_dec = _latent_matmuls(params, net)
    cb_lat = build_dense_blocks(w_lat.T, b_lat)
    if net.variant == "film":
        cond = jnp.asarray([float(transcribe), float(not transcribe)],
                           jnp.float32)
        film = params["film_layer"]
        gamma = film["gamma"]["kernel"].T @ cond + film["gamma"]["bias"]
        beta = film["beta"]["kernel"].T @ cond + film["beta"]["bias"]
        w_cond = w_dec * gamma[None, :]
        b_cond = b_dec + w_dec @ beta
    else:
        v = float(not transcribe)
        w_cond = w_dec[:, :-1]
        b_cond = b_dec + v * w_dec[:, -1]
    cb_exp = build_dense_blocks(w_cond, b_cond)
    return LevelSpec([("conv", cb_lat, False), ("conv", cb_exp, True)],
                     cb_lat.r_in)


def fused_forward(params, net, features, transcribe, dtype=jnp.float32,
                  interpret=False):
    """Features (B, F, T, C_in) -> coefficients (B, C_out, F, T) NCHW.

    The fast inference path (Pallas backend). In f32 mode the fused path is
    exact (83 dB vs a true-fp32 ground truth on v5e, where the flax/XLA
    path's default bf16 multiplies land at ~16 dB on an untrained decoder),
    so the latent matmuls run at full precision too; bf16 keeps the fast
    defaults throughout.

    Under ``FUSE_INFERENCE_LEVELS == "full"`` (default) the entire forward
    — encoder, latent bridge, decoder — is ONE Pallas kernel; only the
    packed input and the packed coefficients touch HBM (cumulative
    time-tap reach 50 of the 64-column halo at the flagship geometry).
    """
    precision = ("highest" if jnp.dtype(dtype) == jnp.float32 else "default")
    x = pack_nhwc(features).astype(dtype)
    # "full" is gated to bf16 on hardware: at HIGHEST precision every f32
    # dot lowers to a 3-pass bf16 sequence and Mosaic's compile of the
    # 36-item chain blows past 40 minutes (measured, r5) — the f32 paths
    # keep the whole-encoder/whole-decoder pair (+9% over per-level,
    # minutes-scale compile). Interpret mode keeps "full" so the tests
    # exercise the single-kernel chain and the conditioning fold exactly.
    full_ok = jnp.dtype(dtype) == jnp.bfloat16 or interpret
    if (not net.skip_connections and FUSE_INFERENCE_LEVELS == "full"
            and full_ok):
        especs, dspecs = _inference_specs(params, net)
        bridge = _latent_bridge_spec(params, net, transcribe)
        spec = fuse_level_specs(especs + [bridge] + dspecs)
        y = fused_level_apply(x, spec, dtype=dtype, interpret=interpret)
        y = y.astype(jnp.float32)
        if net.variant == "mag":
            y = jax.nn.relu(y)
        elif net.variant == "magdb":
            y = jax.nn.sigmoid(y)
        return packed_to_nchw(y, net.feature_size, net.in_channels)
    if net.skip_connections:
        latents, embs = encode_packed(params, net, x, "pallas", dtype,
                                      precision, interpret,
                                      with_embeddings=True)
        skips = _scale_skips(params, embs)
    else:
        latents = encode_packed(params, net, x, "pallas", dtype, precision,
                                interpret)
        skips = None
    y = decode_packed(params, net, latents, transcribe, "pallas", dtype,
                      precision, interpret, skips=skips)
    return packed_to_nchw(y, net.feature_size, net.in_channels)


def _scale_skips(params, embeddings):
    """Learnable per-level skip weights (reference modules.py:61-66)."""
    sw = params["skip_weights"]
    return [sw[i] * e.astype(jnp.float32) for i, e in enumerate(embeddings)]


def packed_train_forward(params, net, features, consistency, backend="xla",
                         remat=True, interpret=False, mesh=None,
                         dtype=jnp.float32, tile_t=None, batch_pairs=False):
    """Training-mode forward on packed tensors.

    Returns (reconstruction, latents, transcription, transcription_rec,
    transcription_scr) with all coefficients PACKED (B, F*C, T) — the same
    quantities as ``TimbreTrapNet.__call__`` (reference modules.py:338-393)
    in the padding-free layout. ``remat`` checkpoints each level so only
    packed level inputs are saved for the backward pass. ``dtype=bfloat16``
    (pallas_train backend) stores level activations bf16 with f32
    accumulation — the mixed-precision training mode. ``tile_t`` overrides
    the training kernels' time-tile width (defaults 512 bf16 / 384 f32,
    measured at the reference recipe).

    ``batch_pairs``: the reference's four decoder calls
    (modules.py:338-393) come in two pairs that share weights, level grids
    and input latents, differing only in the decoder-switch conditioning —
    ``True`` runs each pair as ONE 2B-batch decoder sweep (branches
    stacked on the batch axis), halving decoder kernel dispatches.
    Per-sample math is identical (every level is batch-independent;
    parity + gradients tested in test_fused). MEASURED NON-WIN on the
    real chip (tools/verify_r5.py A/B at the reference recipe,
    pallas_bf16): stacked 350.2 vs separate 335.4 ms/step, loss delta 0 —
    the 2B level kernels double each level's HBM slab and re-tiled grids
    recompile wider, costing more than the saved per-dispatch boundary
    overhead. Default False (the measured winner); the flag stays for
    re-measurement on future kernel shapes.
    """
    kw = dict(backend=backend, dtype=dtype, precision="default",
              interpret=interpret, remat=remat, mesh=mesh, tile_t=tile_t)
    skip = net.skip_connections
    x = pack_nhwc(features)

    def enc(v):
        if skip:
            latents, embs = encode_packed(params, net, v,
                                          with_embeddings=True, **kw)
            return latents, _scale_skips(params, embs)
        return encode_packed(params, net, v, **kw), None

    def decode_pair(latents, skips):
        """(reconstruction, transcription) via one stacked decoder sweep."""
        if not batch_pairs:
            return (decode_packed(params, net, latents, False, skips=skips,
                                  **kw),
                    decode_packed(params, net, latents, True, skips=skips,
                                  **kw))
        b = latents.shape[0]
        stacked = decode_packed(params, net,
                                jnp.concatenate([latents, latents], axis=0),
                                (False, True), skips=skips, **kw)
        return stacked[:b], stacked[b:]

    latents, skips = enc(x)
    reconstruction, transcription = decode_pair(latents, skips)
    if consistency:
        latents_t, skips_t = enc(transcription)
        trn_rec, trn_scr = decode_pair(latents_t, skips_t)
    else:
        trn_rec, trn_scr = None, None
    return reconstruction, latents, transcription, trn_rec, trn_scr
