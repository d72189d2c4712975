"""Visualize time-averaged stem latents with t-SNE
(reference: experiments/latents.py).

Computes the latent code of each Bach10 stem, averages it over time, and
saves a 2-D t-SNE scatter colored by instrument.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.data import constants
from timbre_trap_tpu.models import load_model
from timbre_trap_tpu.utils import to_array
from timbre_trap_tpu.utils.visualization import plot_latents


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--bach10-dir", default=None)
    p.add_argument("--output", default=os.path.join("generated",
                                                    "latents.pdf"))
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--n-octaves", type=int, default=9)
    p.add_argument("--bins-per-octave", type=int, default=60)
    p.add_argument("--latent-size", type=int, default=128)
    p.add_argument("--model-complexity", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    model = load_model(
        args.checkpoint,
        defaults=dict(sample_rate=args.sample_rate,
                      n_octaves=args.n_octaves,
                      bins_per_octave=args.bins_per_octave, secs_per_block=3,
                      latent_size=args.latent_size,
                      model_complexity=args.model_complexity))

    from timbre_trap_tpu.data.datasets.SoloMultiPitch import Bach10

    eval_set = Bach10(base_dir=args.bach10_dir, splits=None,
                      sample_rate=args.sample_rate, cqt=model.sliCQ)

    latents, labels = [], []
    for data in eval_set:
        track = data[constants.KEY_TRACK]
        audio = np.asarray(data[constants.KEY_AUDIO])[None]
        audio = np.asarray(model.sliCQ.pad_to_block_length(audio))
        z, _, _ = model.encode(audio)           # (1, D, T)
        latents.append(to_array(z)[0].mean(axis=-1))
        labels.append(track.split("-")[-1])      # instrument name
        print(f"encoded {track}")

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    plot_latents(np.stack(latents), labels, seed=args.seed,
                 save_path=args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
