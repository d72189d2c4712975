"""Dataset evaluation driver (reference: experiments/evaluate.py).

Per track: full-length forward pass, transcription activations ->
peak-picked multi-pitch -> metric suite; reconstruction SDR via the
projection-filter SDR; loss accounting; optional TensorBoard logging of
scalars and coefficient images.
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
from ..transform.design import midi_to_hz
from ..utils import MultipitchEvaluator, to_array
from .multipitch import MAX_FREQ
from .sdr import signal_distortion_ratio

__all__ = ["evaluate"]


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
        targets = np.asarray(data[constants.KEY_GROUND_TRUTH])[None]

        if isinstance(eval_set, NoteDataset):
            times_ref = data[constants.KEY_TIMES]
            pitches, intervals = eval_set.get_ground_truth(track)
            pitches = midi_to_hz(pitches)
            multi_pitch_ref = eval_set.notes_to_multi_pitch(
                pitches, intervals, times_ref)
        else:
            times_ref, multi_pitch_ref = eval_set.get_ground_truth(track)

        audio = np.asarray(model.sliCQ.pad_to_block_length(audio))

        # Feature/target coefficients (variant-aware, NCHW-like layout).
        features = to_array(model.features_from_audio(audio))
        coefficients = np.moveaxis(features, -1, 1)

        reconstruction, latents, transcription_coeffs, trn_rec, trn_scr, \
            losses = model.forward(audio, bool(multipliers["consistency"]))

        transcription = model.to_activations(transcription_coeffs)
        activations = to_array(transcription)[0]

        times_est = model.sliCQ.get_times(
            model.sliCQ.get_expected_frames(audio.shape[-1]))

        if np.sum(activations[valid_freqs]):
            warnings.warn("Positive activations were generated for "
                          "invalid frequencies.", RuntimeWarning)
            activations[valid_freqs] = 0

        multi_pitch_est = PitchDataset.activations_to_multi_pitch(
            activations, model.sliCQ.midi_freqs, peaks_only=True)

        results = evaluator.evaluate(times_est, multi_pitch_est,
                                     times_ref, multi_pitch_ref)
        evaluator.append_results(results)

        if not isinstance(model, TimbreTrapMag):
            synth = to_array(model.sliCQ.decode(reconstruction))
            sdr = signal_distortion_ratio(synth, audio)
            evaluator.append_results({"reconstruction/SDR": sdr})

        reconstruction_loss = float(compute_reconstruction_loss(
            jnp.asarray(to_array(reconstruction)), jnp.asarray(coefficients)))

        n_pad = len(times_est) - targets.shape[-1]
        targets = np.pad(targets, [(0, 0), (0, 0), (0, n_pad)])
        transcription_loss = float(compute_transcription_loss(
            jnp.asarray(to_array(transcription)), jnp.asarray(targets), True))

        total_loss = (multipliers["reconstruction"] * reconstruction_loss
                      + multipliers["transcription"] * transcription_loss)

        if multipliers["consistency"]:
            consistency_loss = float(sum(compute_consistency_loss(
                jnp.asarray(to_array(trn_rec)), jnp.asarray(to_array(trn_scr)),
                jnp.asarray(to_array(transcription_coeffs)))))
            evaluator.append_results({"loss/consistency": consistency_loss})
            total_loss += multipliers["consistency"] * consistency_loss

        for key_loss, val_loss in losses.items():
            evaluator.append_results({f"loss/{key_loss}": float(val_loss)})
            total_loss += multipliers.get(key_loss, 1) * float(val_loss)

        evaluator.append_results({"loss/reconstruction": reconstruction_loss,
                                  "loss/transcription": transcription_loss,
                                  "loss/total": total_loss})
        last_vis = (coefficients, to_array(reconstruction),
                    to_array(transcription), targets)

    average_results, _ = evaluator.average_results()

    if writer is not None:
        for key, value in average_results.items():
            writer.add_scalar(f"{eval_set.name()}/{key}", value, i)
        if last_vis is not None:
            coefficients, reconstruction, transcription, targets = last_vis
            from ..transform import CQT

            feats_db = to_array(CQT.to_decibels(CQT.to_magnitude(
                jnp.asarray(coefficients))))
            recon_db = to_array(CQT.to_decibels(CQT.to_magnitude(
                jnp.asarray(reconstruction))))
            for tag, img in (("magnitude CQT", feats_db),
                             ("reconstruction", recon_db),
                             ("ground-truth", targets),
                             ("transcription", transcription)):
                pooled = _avg_pool_time(np.asarray(img))
                writer.add_image(f"{eval_set.name()}/vis/{tag}",
                                 pooled[..., ::-1, :][0][None], i)

    return average_results
