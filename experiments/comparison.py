"""Compare Timbre-Trap against baseline transcription methods on Bach10
(reference: experiments/comparison.py).

Baselines implemented natively: amplitude-weighted peak-picking on the
linear-magnitude CQT (threshold 0.3) and on the rescaled log-magnitude CQT
(threshold 0.8); Timbre-Trap itself runs at threshold 0.5. The external
TensorFlow baselines of the reference (Basic-Pitch, Deep-Salience) require
downloads + TF and are gated behind flags.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.data import constants
from timbre_trap_tpu.data.pitch import PitchDataset
from timbre_trap_tpu.eval import MAX_FREQ
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.train import load_params
from timbre_trap_tpu.transform import CQT
from timbre_trap_tpu.transform.design import midi_to_hz
from timbre_trap_tpu.utils import MultipitchEvaluator, print_and_log, to_array


def evaluate_method(eval_set, estimator, log_path=None, tag=""):
    evaluator = MultipitchEvaluator()
    for data in eval_set:
        track = data[constants.KEY_TRACK]
        times_ref, multi_pitch_ref = eval_set.get_ground_truth(track)
        times_est, multi_pitch_est = estimator(data)
        results = evaluator.evaluate(times_est, multi_pitch_est,
                                     times_ref, multi_pitch_ref)
        evaluator.append_results(results)
    mean, std = evaluator.average_results()
    print_and_log(f"[{tag}] mean={mean}", log_path)
    return mean


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="Timbre-Trap checkpoint (omit to skip the model)")
    p.add_argument("--bach10-dir", default=None)
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--log-path", default=None)
    p.add_argument("--thr-lin", type=float, default=0.3)
    p.add_argument("--thr-log", type=float, default=0.8)
    p.add_argument("--thr-tt", type=float, default=0.5)
    args = p.parse_args()

    cqt = CQT(n_octaves=9, bins_per_octave=60,
              sample_rate=args.sample_rate, secs_per_block=3)

    from timbre_trap_tpu.data.datasets.MixedMultiPitch import Bach10

    eval_set = Bach10(base_dir=args.bach10_dir, splits=None,
                      sample_rate=args.sample_rate, cqt=cqt)

    valid = midi_to_hz(cqt.midi_freqs) > MAX_FREQ

    def _mask(acts):
        acts = np.array(acts)  # device arrays come back read-only
        acts[valid] = 0
        return acts

    def _times_for(audio):
        return cqt.get_times(cqt.get_expected_frames(audio.shape[-1]))

    def lin_cqt(data):
        audio = np.asarray(cqt.pad_to_block_length(
            np.asarray(data[constants.KEY_AUDIO])[None]))
        mag = to_array(CQT.to_magnitude(cqt.forward(audio)))[0]
        acts = _mask(mag / max(mag.max(), 1e-8))
        mp = PitchDataset.activations_to_multi_pitch(
            acts, cqt.midi_freqs, peaks_only=True, t=args.thr_lin)
        return _times_for(audio), mp

    def log_cqt(data):
        audio = np.asarray(cqt.pad_to_block_length(
            np.asarray(data[constants.KEY_AUDIO])[None]))
        mag = CQT.to_magnitude(cqt.forward(audio))
        acts = _mask(to_array(CQT.to_decibels(mag))[0])
        mp = PitchDataset.activations_to_multi_pitch(
            acts, cqt.midi_freqs, peaks_only=True, t=args.thr_log)
        return _times_for(audio), mp

    evaluate_method(eval_set, lin_cqt, args.log_path, "lin-CQT")
    evaluate_method(eval_set, log_cqt, args.log_path, "log-CQT")

    if args.checkpoint is not None:
        model = TimbreTrap(sample_rate=args.sample_rate, n_octaves=9,
                           bins_per_octave=60, secs_per_block=3,
                           latent_size=128, model_complexity=2)
        model.params = load_params(args.checkpoint)

        def timbre_trap(data):
            audio = np.asarray(model.sliCQ.pad_to_block_length(
                np.asarray(data[constants.KEY_AUDIO])[None]))
            acts = _mask(to_array(model.transcribe(audio))[0])
            mp = PitchDataset.activations_to_multi_pitch(
                acts, model.sliCQ.midi_freqs, peaks_only=True, t=args.thr_tt)
            return _times_for(audio), mp

        evaluate_method(eval_set, timbre_trap, args.log_path, "timbre-trap")


if __name__ == "__main__":
    main()
