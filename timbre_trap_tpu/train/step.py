"""The jitted training step: loss composition, AdamW, grad telemetry.

Loss composition mirrors the reference trainer (``experiments/train.py:
404-464``): the batch is [MPE samples | audio-only samples]; reconstruction
loss runs on the full batch against the (stop-gradient) transform
coefficients, transcription + consistency losses run on the MPE prefix only.
Unlike the reference, the CQT is computed ONCE per step (the reference
computes it twice — at train.py:404 for targets and again inside
``model.forward``).

Optimizer: AdamW with decoupled weight decay and global-norm clipping at 10
(``train.py:334,493``), with the learning rate passed in as a scalar so
host-side schedules (warmup x plateau) never trigger recompiles.

The step is sharding-agnostic: wrap it with :func:`shard_train_step` to run
data-parallel over a mesh — XLA inserts the gradient all-reduce.
"""

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharded, replicated

__all__ = ["TrainConfig", "TRAIN_AUDIO_SCALE", "make_optimizer",
           "make_loss_fn", "make_train_step", "shard_train_step",
           "init_train_state", "grad_norm_telemetry", "compact_audio",
           "compact_ground_truth"]

# int16 grid for compact trainer audio uploads: range +-8 covers the
# StemMixingDataset worst case (<= 5 summed infinity-normalized stems,
# data/base.py:90-131) with quantization 1/4096 ~= 2.4e-4 — far below the
# audio noise floor; features run under stop_gradient either way.
TRAIN_AUDIO_SCALE = 4096.0


def compact_audio(audio):
    """Quantize f32 audio to the fixed +-8 int16 upload grid (host side)."""
    import numpy as np

    return np.clip(np.rint(np.asarray(audio, np.float32) * TRAIN_AUDIO_SCALE),
                   -32768, 32767).astype(np.int16)


def compact_ground_truth(gt):
    """Quantize a [0,1] GT raster to dense uint8 for upload (host side).

    Dense uint8 is the MEASURED best encoding on the tunneled runtime
    (uploads run ~100 MB/s and serialize with device execution): a
    bitmap-sparse form (packbits mask + value stream, 3.3 MB vs 13.6 MB at
    the reference recipe) lost because its on-device decode needs a
    raster-length cumsum (138 ms — more than the upload it saves), and COO
    index/value scatter only breaks even at safe capacities
    (docs/PERFORMANCE.md "Measured dead ends").
    """
    import numpy as np

    return np.rint(np.clip(np.asarray(gt, np.float32), 0.0, 1.0)
                   * 255.0).astype(np.uint8)


@dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters of one training run (reference train.py:29-124)."""

    learning_rate: float = 1e-3
    weight_decay: float = 0.01           # torch AdamW default
    grad_clip: float = 10.0
    multiplier_reconstruction: float = 1.0
    multiplier_transcription: float = 1.0
    multiplier_consistency: float = 1.0
    weight_positive_class: bool = True
    transcription_active: bool = True    # False before n_epochs_late_start
    # Average gradients over k consecutive step() calls before applying the
    # update — reaches the reference global batch (8 x 9-s crops) on few
    # chips when HBM bounds the per-step batch (see README "Training
    # memory on TPU").
    grad_accum_steps: int = 1


def make_optimizer(config: TrainConfig):
    """AdamW (decoupled wd) + global-norm clip; LR applied inside the step."""
    tx = optax.chain(
        optax.clip_by_global_norm(config.grad_clip),
        optax.scale_by_adam(),
        optax.add_decayed_weights(config.weight_decay),
        optax.scale(-1.0),
    )
    if config.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=config.grad_accum_steps)
    return tx


def init_train_state(model, config: TrainConfig):
    """Returns (params, opt_state) for a model instance."""
    tx = make_optimizer(config)
    return model.params, tx.init(model.params)


def grad_norm_telemetry(grads):
    """Average/max per-leaf gradient norms for encoder and decoder subtrees
    (reference utils/experiments.py:144-280, logged at train.py:474-490)."""
    metrics = {}
    for scope in ("encoder", "decoder"):
        sub = grads.get(scope) if isinstance(grads, dict) else None
        if sub is None:
            continue
        leaves = jax.tree.leaves(sub)
        norms = jnp.stack([jnp.linalg.norm(g.ravel()) for g in leaves])
        metrics[f"avg_norm/{scope}"] = jnp.mean(norms)
        metrics[f"max_norm/{scope}"] = jnp.max(norms)
    return metrics


def _recon_loss_nhwc(reconstructed, target):
    """Reconstruction loss on NHWC (B, F, T, C): sum over F+C, mean over B+T
    — identical math to objectives.compute_reconstruction_loss on NCHW."""
    se = jnp.square(reconstructed - target)
    return jnp.mean(jnp.sum(se, axis=(1, 3)))


def _recon_loss_nchw(reconstructed, target):
    """Reference-layout (B, C, F, T) reconstruction loss."""
    se = jnp.square(reconstructed - target)
    return jnp.mean(jnp.sum(se, axis=(-3, -2)))


def _recon_loss_packed(reconstructed, target):
    """Packed-layout (B, F*C, T) reconstruction loss — the row sum equals
    the reference's sum over channel+frequency (objectives.py:11-33)."""
    se = jnp.square(reconstructed - target)
    return jnp.mean(jnp.sum(se, axis=-2))


def _transcription_loss(estimate, target, weighted):
    """(B, F, T) activations vs ground truth (objectives.py:36-74)."""
    loss = jnp.square(estimate - target)
    if weighted:
        eps = jnp.finfo(jnp.float32).eps
        pos = jnp.sum(target, axis=-2, keepdims=True)
        neg = jnp.sum(1.0 - target, axis=-2, keepdims=True)
        scaling = jnp.where(target == 1, neg / (pos + eps), 0.0)
        scaling = jnp.where(scaling == 0, 1.0, scaling)
        loss = loss * scaling
    return jnp.mean(jnp.sum(loss, axis=-2))


def make_loss_fn(model, config: TrainConfig, mpe_batch_size: int,
                 conv_backend="flax", mesh=None, interpret=False,
                 tile_t=None):
    """Build the pure loss function used by :func:`make_train_step`.

    ``loss_fn(params, features, ground_truth) -> (total, metrics)``.
    Exposed separately so measurement tools can time the forward /
    backward / optimizer phases of the step independently
    (tools/tpu_perf.py trainstep)."""
    net = model.net
    consistency = bool(config.multiplier_consistency)
    packed = conv_backend in ("packed", "pallas", "pallas_bf16")
    # Under remat, coefficients flow through the loss in NCHW — the saved
    # residuals then have padding-free layouts (see models.modules).
    nchw = bool(getattr(net, "remat", False)) and not packed
    recon_loss = _recon_loss_nchw if nchw else _recon_loss_nhwc
    to_activations_nhwc = model.to_activations_nhwc

    def packed_loss_fn(params, features, ground_truth):
        from ..models.fused import packed_to_nchw, packed_train_forward
        from ..ops.packed_conv import pack_nhwc

        pallas = conv_backend.startswith("pallas")
        rec, _, trn, trn_rec, trn_scr = packed_train_forward(
            params, net, features, consistency,
            backend="pallas_train" if pallas else "xla",
            remat=not pallas,
            mesh=mesh if pallas else None,
            interpret=interpret,
            dtype=(jnp.bfloat16 if conv_backend == "pallas_bf16"
                   else jnp.float32),
            tile_t=tile_t)
        target = pack_nhwc(features)
        activations = model.to_activations(
            packed_to_nchw(trn, net.feature_size, net.in_channels))
        loss_rec = _recon_loss_packed(rec, target)
        loss_trn = _transcription_loss(activations[:mpe_batch_size],
                                       ground_truth,
                                       config.weight_positive_class)
        metrics = {"loss/reconstruction": loss_rec,
                   "loss/transcription": loss_trn}
        total = config.multiplier_reconstruction * loss_rec
        if consistency:
            target_c = trn[:mpe_batch_size]
            loss_sp = _recon_loss_packed(trn_rec[:mpe_batch_size], target_c)
            loss_sc = _recon_loss_packed(trn_scr[:mpe_batch_size], target_c)
            metrics["loss/consistency/spectral"] = loss_sp
            metrics["loss/consistency/score"] = loss_sc
        if config.transcription_active:
            total = total + config.multiplier_transcription * loss_trn
            if consistency:
                total = total + config.multiplier_consistency * (loss_sp + loss_sc)
        metrics["loss/total"] = total
        return total, metrics

    def loss_fn(params, features, ground_truth):
        if packed:
            return packed_loss_fn(params, features, ground_truth)
        outputs = net.apply({"params": params}, features, consistency,
                            nchw_outputs=nchw)
        reconstruction, _, transcription, trn_rec, trn_scr, aux_losses = outputs

        if nchw:
            target = jnp.transpose(features, (0, 3, 1, 2))
            activations = model.to_activations(transcription)  # (B,C,F,T) in
        else:
            target = features
            activations = to_activations_nhwc(transcription)
        loss_rec = recon_loss(reconstruction, target)
        loss_trn = _transcription_loss(activations[:mpe_batch_size],
                                       ground_truth,
                                       config.weight_positive_class)
        metrics = {"loss/reconstruction": loss_rec,
                   "loss/transcription": loss_trn}
        total = config.multiplier_reconstruction * loss_rec
        if consistency:
            target_c = transcription[:mpe_batch_size]
            loss_sp = recon_loss(trn_rec[:mpe_batch_size], target_c)
            loss_sc = recon_loss(trn_scr[:mpe_batch_size], target_c)
            metrics["loss/consistency/spectral"] = loss_sp
            metrics["loss/consistency/score"] = loss_sc
        if config.transcription_active:
            total = total + config.multiplier_transcription * loss_trn
            if consistency:
                total = total + config.multiplier_consistency * (loss_sp + loss_sc)
        for key, val in aux_losses.items():
            metrics[f"loss/{key}"] = val
            total = total + val
        metrics["loss/total"] = total
        return total, metrics

    return loss_fn


def make_train_step(model, config: TrainConfig, mpe_batch_size: int,
                    conv_backend="flax", mesh=None, interpret=False,
                    tile_t=None, compact_audio_grid=False):
    """Build the pure train step for a model instance.

    step(params, opt_state, audio, ground_truth, lr) -> (params, opt_state,
    metrics). ``audio`` is (B, 1, N) with the first ``mpe_batch_size``
    samples annotated; ``ground_truth`` is (mpe_batch_size, F, T_frames).

    ``conv_backend``: "flax" applies the flax modules (NHWC convs with NCHW
    remat boundaries when ``model`` was built with remat); "packed" runs the
    forward in the packed f-major banded form (models/fused.py) with
    per-level checkpointing — no lane-padded conv transients, which is what
    fits the reference training recipe (batch 8 x 9-s crops,
    train.py:39-101) in single-chip HBM; "pallas" additionally executes
    each level as the fused Pallas kernels with a custom-VJP Pallas
    backward (adjoint banded blocks); "pallas_bf16" is the mixed-precision
    variant (bf16 level storage/operands, f32 accumulation everywhere).

    ``mesh`` (pallas backend only): run each fused level under
    ``jax.shard_map`` over the mesh's leading axis so the production kernel
    path composes with data parallelism — pass the same mesh to
    :func:`shard_train_step`. The XLA backends partition under sharded jit
    without it. ``interpret`` runs the Pallas kernels in interpret mode
    (CPU tests). ``tile_t`` overrides the training kernels' time-tile
    width (defaults: 512 bf16 / 384 f32 —
    ops/fused_level.default_train_tile_t; pass a narrower tile if a custom
    geometry exhausts backward-kernel VMEM).

    ``compact_audio_grid``: how int16 audio is dequantized. False (the
    library-wide contract, models/timbre_trap.py:114-116) treats int16 as
    PCM16 (/32768). The Trainer builds its step with True so int16 means
    the compact-upload ±8 grid (/TRAIN_AUDIO_SCALE, compact_audio) —
    PCM16's ±1 range cannot represent summed-stem mixes. uint8 ground
    truth is unambiguous (/255) either way.
    """
    features_from_audio = model.features_from_audio
    loss_fn = make_loss_fn(model, config, mpe_batch_size,
                           conv_backend=conv_backend, mesh=mesh,
                           interpret=interpret, tile_t=tile_t)
    tx = make_optimizer(config)

    def step(params, opt_state, audio, ground_truth, lr):
        # Compact-upload dequantization (Trainer._compose_batch /
        # compact_audio / compact_ground_truth): training inputs may arrive
        # as int16 audio (the ±8 compact grid when the step was built with
        # compact_audio_grid, else PCM16 — handled by features_from_audio)
        # and uint8 /255 ground truth — 72 MB -> 16.4 MB per
        # reference-recipe batch. Uploads serialize with device execution
        # on tunneled runtimes (~100 MB/s measured), so smaller uploads
        # directly shorten the step wall time. Dequantization restores
        # exact {0,1} endpoints, so the ==1 positive-class weighting below
        # is unaffected.
        if compact_audio_grid and audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) * (1.0 / TRAIN_AUDIO_SCALE)
        features = features_from_audio(audio)
        if ground_truth.dtype == jnp.uint8:
            ground_truth = ground_truth.astype(jnp.float32) * (1.0 / 255.0)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, features, ground_truth)
        metrics.update(grad_norm_telemetry(grads))
        updates, opt_state = tx.update(grads, opt_state, params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        metrics["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return params, opt_state, metrics

    return step


def shard_train_step(step_fn, mesh):
    """Jit a train step data-parallel over ``mesh``.

    Parameters/optimizer state are replicated; audio and ground truth are
    sharded over the leading batch axis. XLA emits the gradient all-reduce
    over ICI (SURVEY.md §2.6 — the DataParallel equivalent).
    """
    repl = replicated(mesh)
    data = batch_sharded(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, data, data, None),
        out_shardings=(repl, repl, repl),
    )
