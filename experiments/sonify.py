"""Sonify model outputs for Bach10 (reference: experiments/sonify.py).

For each track writes three WAV files: ``*_ref.wav`` (pure invertible-CQT
round trip), ``*_rec.wav`` (decoded model reconstruction) and ``*_scr.wav``
(decoded — "sonified" — transcription coefficients).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.data import constants
from timbre_trap_tpu.data.io import save_wav
from timbre_trap_tpu.models import load_model
from timbre_trap_tpu.utils import to_array


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--bach10-dir", default=None)
    p.add_argument("--output-dir", default=os.path.join("generated", "sonify"))
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--n-octaves", type=int, default=9)
    p.add_argument("--bins-per-octave", type=int, default=60)
    p.add_argument("--latent-size", type=int, default=128)
    p.add_argument("--model-complexity", type=int, default=2)
    p.add_argument("--stems", action="store_true",
                   help="process Bach10 stems instead of mixtures")
    args = p.parse_args()

    model = load_model(
        args.checkpoint,
        defaults=dict(sample_rate=args.sample_rate,
                      n_octaves=args.n_octaves,
                      bins_per_octave=args.bins_per_octave, secs_per_block=3,
                      latent_size=args.latent_size,
                      model_complexity=args.model_complexity))

    if args.stems:
        from timbre_trap_tpu.data.datasets.SoloMultiPitch import Bach10
    else:
        from timbre_trap_tpu.data.datasets.MixedMultiPitch import Bach10

    eval_set = Bach10(base_dir=args.bach10_dir, splits=None,
                      sample_rate=args.sample_rate, cqt=model.sliCQ)
    os.makedirs(args.output_dir, exist_ok=True)

    for data in eval_set:
        track = data[constants.KEY_TRACK].replace(os.sep, "-")
        audio = np.asarray(data[constants.KEY_AUDIO])[None]
        audio = np.asarray(model.sliCQ.pad_to_block_length(audio))

        # Pure transform round trip
        coefficients = model.sliCQ.encode(audio)
        ref = to_array(model.sliCQ.decode(coefficients))[0]
        save_wav(os.path.join(args.output_dir, f"{track}_ref.wav"),
                 ref, args.sample_rate)

        # Decoded reconstruction
        rec_coeffs = model.inference(audio, transcribe=False)
        rec = to_array(model.sliCQ.decode(rec_coeffs))[0]
        save_wav(os.path.join(args.output_dir, f"{track}_rec.wav"),
                 rec, args.sample_rate)

        # Sonified transcription
        scr_coeffs = model.inference(audio, transcribe=True)
        scr = to_array(model.sliCQ.decode(scr_coeffs))[0]
        save_wav(os.path.join(args.output_dir, f"{track}_scr.wav"),
                 scr, args.sample_rate)
        print(f"sonified {track}")


if __name__ == "__main__":
    main()
