"""Dataset evaluation driver (reference: experiments/evaluate.py).

Per track: full-length forward pass, transcription activations ->
peak-picked multi-pitch -> metric suite; reconstruction SDR via the
projection-filter SDR; loss accounting; optional TensorBoard logging of
scalars and coefficient images.

Device-centric by design: losses are reduced to scalars on the
accelerator and predictions leave the device as a bit-sized binary mask —
full-resolution activations/coefficients are only downloaded when the
TensorBoard writer needs images. (Host downloads are the eval bottleneck
on tunneled TPU runtimes.)
"""

import warnings

import numpy as np
import jax.numpy as jnp

from ..data import constants
from ..data.note import NoteDataset
from ..data.pitch import PitchDataset
from ..models import TimbreTrapMag
from ..objectives import (compute_consistency_loss,
                          compute_reconstruction_loss,
                          compute_transcription_loss)
from ..ops.peaks import peak_mask
from ..transform.design import midi_to_hz
from ..utils import MultipitchEvaluator, to_array
from .multipitch import MAX_FREQ
from .sdr import signal_distortion_ratio

__all__ = ["evaluate", "masked_peak_estimates"]


def masked_peak_estimates(transcription, invalid_freqs):
    """Activations (1, F, T) -> peak-picked binary mask (F, T) numpy.

    Zeroes activations at invalid frequencies BEFORE peak-picking, as the
    reference does (evaluate.py:105-110) — the order matters at boundary
    bins, where a removed activation can promote or suppress a neighboring
    peak. The any-positive check is a device-side scalar reduce; only the
    bit-sized binary mask is downloaded.
    """
    invalid = np.asarray(invalid_freqs)[None, :, None]
    if float(jnp.sum(jnp.where(invalid, transcription, 0.0))):
        warnings.warn("Positive activations were generated for "
                      "invalid frequencies.", RuntimeWarning)
        transcription = jnp.where(invalid, 0.0, transcription)
    return to_array(peak_mask(transcription))[0].astype(np.float64)


def _avg_pool_time(array, k=7):
    """Average-pool the trailing (time) axis by factor k for visualization."""
    t = array.shape[-1] // k * k
    trimmed = array[..., :t]
    return trimmed.reshape(*trimmed.shape[:-1], t // k, k).mean(axis=-1)


def evaluate(model, eval_set, multipliers, writer=None, i=0):
    """Evaluate a model over every track of a dataset; returns mean results."""
    evaluator = MultipitchEvaluator()

    # Frequency bins outside the valid multi-pitch range (reference :47-48).
    valid_freqs = midi_to_hz(model.sliCQ.midi_freqs) > MAX_FREQ

    last_vis = None
    for data in eval_set:
        track = data[constants.KEY_TRACK]
        audio = np.asarray(data[constants.KEY_AUDIO])[None]  # (1, 1, N)
        targets_np = np.asarray(data[constants.KEY_GROUND_TRUTH])[None]

        if isinstance(eval_set, NoteDataset):
            times_ref = data[constants.KEY_TIMES]
            pitches, intervals = eval_set.get_ground_truth(track)
            pitches = midi_to_hz(pitches)
            multi_pitch_ref = eval_set.notes_to_multi_pitch(
                pitches, intervals, times_ref)
        else:
            times_ref, multi_pitch_ref = eval_set.get_ground_truth(track)

        audio = np.asarray(model.sliCQ.pad_to_block_length(audio))

        # Device-resident feature/target coefficients (variant-aware).
        # Jitted: complex intermediates only exist inside compiled programs
        # (eager complex ops are unimplemented on some TPU runtimes).
        features = model._features_jit(jnp.asarray(audio))
        coefficients = jnp.moveaxis(features, -1, 1)

        reconstruction, latents, transcription_coeffs, trn_rec, trn_scr, \
            losses = model.forward(audio, bool(multipliers["consistency"]))

        transcription = model.to_activations(transcription_coeffs)

        times_est = model.sliCQ.get_times(
            model.sliCQ.get_expected_frames(audio.shape[-1]))

        mask = masked_peak_estimates(transcription, valid_freqs)

        multi_pitch_est = PitchDataset.activations_to_multi_pitch(
            mask, model.sliCQ.midi_freqs, peaks_only=False)

        results = evaluator.evaluate(times_est, multi_pitch_est,
                                     times_ref, multi_pitch_ref)
        evaluator.append_results(results)

        if not isinstance(model, TimbreTrapMag):
            synth = to_array(model.sliCQ.decode(reconstruction))
            sdr = signal_distortion_ratio(synth, audio)
            evaluator.append_results({"reconstruction/SDR": sdr})

        # --- device-side loss accounting (scalars only leave the device) --
        reconstruction_loss = float(compute_reconstruction_loss(
            reconstruction, coefficients))

        n_pad = len(times_est) - targets_np.shape[-1]
        targets = jnp.asarray(np.pad(targets_np,
                                     [(0, 0), (0, 0), (0, n_pad)]))
        transcription_loss = float(compute_transcription_loss(
            transcription, targets, True))

        total_loss = (multipliers["reconstruction"] * reconstruction_loss
                      + multipliers["transcription"] * transcription_loss)

        if multipliers["consistency"]:
            loss_sp, loss_sc = compute_consistency_loss(
                trn_rec, trn_scr, transcription_coeffs)
            consistency_loss = float(loss_sp) + float(loss_sc)
            evaluator.append_results({"loss/consistency": consistency_loss})
            total_loss += multipliers["consistency"] * consistency_loss

        for key_loss, val_loss in losses.items():
            evaluator.append_results({f"loss/{key_loss}": float(val_loss)})
            total_loss += multipliers.get(key_loss, 1) * float(val_loss)

        evaluator.append_results({"loss/reconstruction": reconstruction_loss,
                                  "loss/transcription": transcription_loss,
                                  "loss/total": total_loss})
        last_vis = (coefficients, reconstruction, transcription, targets)

    average_results, _ = evaluator.average_results()

    if writer is not None:
        for key, value in average_results.items():
            writer.add_scalar(f"{eval_set.name()}/{key}", value, i)
        if last_vis is not None:
            # Full-resolution downloads happen only here, for the images.
            coefficients, reconstruction, transcription, targets = last_vis
            from ..transform import CQT

            feats_db = to_array(CQT.to_decibels(CQT.to_magnitude(coefficients)))
            recon_db = to_array(CQT.to_decibels(CQT.to_magnitude(
                jnp.asarray(reconstruction))))
            for tag, img in (("magnitude CQT", feats_db),
                             ("reconstruction", recon_db),
                             ("ground-truth", to_array(targets)),
                             ("transcription", to_array(transcription))):
                pooled = _avg_pool_time(np.asarray(img))
                writer.add_image(f"{eval_set.name()}/vis/{tag}",
                                 pooled[..., ::-1, :][0][None], i)

    return average_results
