"""Compare Timbre-Trap against baseline transcription methods
(reference: experiments/comparison.py).

Baselines implemented natively: amplitude-weighted peak-picking on the
linear-magnitude CQT (threshold 0.3) and on the rescaled log-magnitude CQT
(threshold 0.8); Timbre-Trap itself runs at threshold 0.5. The external
baselines of the reference — Basic-Pitch (TF SavedModel, threshold 0.27)
and Deep-Salience (Keras, threshold 0.3) — run behind ``--basic-pitch`` /
``--deep-salience``; when their optional dependencies (tensorflow, the
model files, librosa, network) are missing they skip cleanly with a
message. Evaluation sets mirror the reference: Bach10 mixtures, plus Su
and GuitarSet player 05 when their directories are supplied
(comparison.py:130-146).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.data import constants
from timbre_trap_tpu.data.note import NoteDataset
from timbre_trap_tpu.data.pitch import PitchDataset
from timbre_trap_tpu.eval import MAX_FREQ
from timbre_trap_tpu.eval.external import (BP_MIDI_FREQS,
                                           ExternalBaselineUnavailable,
                                           load_basic_pitch,
                                           load_deep_salience)
from timbre_trap_tpu.models import load_model
from timbre_trap_tpu.transform import CQT
from timbre_trap_tpu.transform.design import midi_to_hz
from timbre_trap_tpu.utils import (MultipitchEvaluator, filter_non_peaks,
                                   print_and_log, threshold, to_array)


def evaluate_method(eval_set, estimator, log_path=None, tag=""):
    evaluator = MultipitchEvaluator()
    for data in eval_set:
        track = data[constants.KEY_TRACK]
        if isinstance(eval_set, NoteDataset):
            times_ref = data[constants.KEY_TIMES]
            pitches, intervals = eval_set.get_ground_truth(track)
            multi_pitch_ref = eval_set.notes_to_multi_pitch(
                midi_to_hz(pitches), intervals, times_ref)
        else:
            times_ref, multi_pitch_ref = eval_set.get_ground_truth(track)
        times_est, multi_pitch_est = estimator(data, eval_set)
        results = evaluator.evaluate(times_est, multi_pitch_est,
                                     times_ref, multi_pitch_ref)
        evaluator.append_results(results)
    mean, std = evaluator.average_results()
    print_and_log(f"[{tag}] mean={mean}", log_path)
    return mean


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="Timbre-Trap checkpoint (omit to skip the model)")
    p.add_argument("--bach10-dir", default=None)
    p.add_argument("--su-dir", default=None,
                   help="evaluate on the Su dataset too (reference :137-141)")
    p.add_argument("--gset-dir", default=None,
                   help="evaluate on GuitarSet player 05 too "
                        "(reference :143-146)")
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--log-path", default=None)
    p.add_argument("--thr-lin", type=float, default=0.3)
    p.add_argument("--thr-log", type=float, default=0.8)
    p.add_argument("--thr-tt", type=float, default=0.5)
    p.add_argument("--basic-pitch", action="store_true",
                   help="include the Basic-Pitch baseline (threshold 0.27)")
    p.add_argument("--basic-pitch-model", default=None,
                   help="path to the Basic-Pitch ICASSP-2022 TF SavedModel "
                        "(default: resolve through the basic_pitch package)")
    p.add_argument("--deep-salience", action="store_true",
                   help="include the Deep-Salience baseline (threshold 0.3)")
    p.add_argument("--deep-salience-dir",
                   default=os.path.join("generated", "deep_salience"),
                   help="cache directory for the Deep-Salience script and "
                        "weights")
    return p.parse_args(argv)


def build_estimators(args, cqt):
    """Assemble the (tag, estimator) list; external loaders that cannot run
    report why and are skipped (never a crash)."""
    valid = midi_to_hz(cqt.midi_freqs) > MAX_FREQ

    def _mask(acts):
        acts = np.array(acts)  # device arrays come back read-only
        acts[valid] = 0
        return acts

    def _times_for(audio):
        return cqt.get_times(cqt.get_expected_frames(audio.shape[-1]))

    def lin_cqt(data, eval_set):
        audio = np.asarray(cqt.pad_to_block_length(
            np.asarray(data[constants.KEY_AUDIO])[None]))
        mag = to_array(CQT.to_magnitude(cqt.forward(audio)))[0]
        acts = _mask(mag / max(mag.max(), 1e-8))
        mp = PitchDataset.activations_to_multi_pitch(
            acts, cqt.midi_freqs, peaks_only=True, t=args.thr_lin)
        return _times_for(audio), mp

    def log_cqt(data, eval_set):
        audio = np.asarray(cqt.pad_to_block_length(
            np.asarray(data[constants.KEY_AUDIO])[None]))
        mag = CQT.to_magnitude(cqt.forward(audio))
        acts = _mask(to_array(CQT.to_decibels(mag))[0])
        mp = PitchDataset.activations_to_multi_pitch(
            acts, cqt.midi_freqs, peaks_only=True, t=args.thr_log)
        return _times_for(audio), mp

    estimators = [("lin-CQT", lin_cqt), ("log-CQT", log_cqt)]

    if args.checkpoint is not None:
        model = load_model(
            args.checkpoint,
            defaults=dict(sample_rate=args.sample_rate, n_octaves=9,
                          bins_per_octave=60, secs_per_block=3,
                          latent_size=128, model_complexity=2))

        def timbre_trap(data, eval_set):
            audio = np.asarray(model.sliCQ.pad_to_block_length(
                np.asarray(data[constants.KEY_AUDIO])[None]))
            acts = _mask(to_array(model.transcribe(audio))[0])
            mp = PitchDataset.activations_to_multi_pitch(
                acts, model.sliCQ.midi_freqs, peaks_only=True, t=args.thr_tt)
            return _times_for(audio), mp

        estimators.append(("timbre-trap", timbre_trap))

    if args.basic_pitch:
        try:
            bp_estimate = load_basic_pitch(args.basic_pitch_model)

            def basic_pitch(data, eval_set):
                audio = np.asarray(data[constants.KEY_AUDIO]).reshape(-1)
                times, salience = bp_estimate(audio)
                acts = threshold(filter_non_peaks(salience), 0.27)
                mp = PitchDataset.activations_to_multi_pitch(
                    acts, BP_MIDI_FREQS)
                return times, mp

            estimators.append(("basic-pitch", basic_pitch))
        except ExternalBaselineUnavailable as exc:
            print_and_log(f"[basic-pitch] SKIPPED: {exc}", args.log_path)

    if args.deep_salience:
        try:
            ds_estimate = load_deep_salience(args.deep_salience_dir)

            def deep_salience(data, eval_set):
                path = eval_set.get_audio_path(data[constants.KEY_TRACK])
                return ds_estimate(path)

            estimators.append(("deep-salience", deep_salience))
        except ExternalBaselineUnavailable as exc:
            print_and_log(f"[deep-salience] SKIPPED: {exc}", args.log_path)

    return estimators


def build_eval_sets(args, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import Bach10

    eval_sets = [Bach10(base_dir=args.bach10_dir, splits=None,
                        sample_rate=args.sample_rate, cqt=cqt)]
    if args.su_dir is not None:
        from timbre_trap_tpu.data.datasets.MixedMultiPitch import Su

        eval_sets.append(Su(base_dir=args.su_dir, splits=None,
                            sample_rate=args.sample_rate, cqt=cqt))
    if args.gset_dir is not None:
        from timbre_trap_tpu.data.datasets.SoloMultiPitch import GuitarSet

        eval_sets.append(GuitarSet(base_dir=args.gset_dir, splits=["05"],
                                   sample_rate=args.sample_rate, cqt=cqt))
    return eval_sets


def main(argv=None):
    args = parse_args(argv)
    cqt = CQT(n_octaves=9, bins_per_octave=60,
              sample_rate=args.sample_rate, secs_per_block=3)

    estimators = build_estimators(args, cqt)
    for eval_set in build_eval_sets(args, cqt):
        print_and_log(f"Results for {eval_set.name()}:", args.log_path)
        for tag, estimator in estimators:
            evaluate_method(eval_set, estimator, args.log_path,
                            f"{eval_set.name()}/{tag}")


if __name__ == "__main__":
    main()
