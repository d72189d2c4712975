"""Evaluate a checkpoint on the standard evaluation sets
(reference: experiments/evaluate.py used as a module + CLI here).

Example:
    python experiments/evaluate.py --checkpoint runs/base/models/model-250 \
        --datasets Bach10 URMP
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.eval.evaluation import evaluate  # noqa: F401 (re-export)
from timbre_trap_tpu.models import load_model
from timbre_trap_tpu.utils import print_and_log


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--datasets", nargs="+", default=["Bach10"],
                   choices=["Bach10", "URMP", "Su", "TRIOS", "GuitarSet"])
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--n-octaves", type=int, default=9)
    p.add_argument("--bins-per-octave", type=int, default=60)
    p.add_argument("--latent-size", type=int, default=128)
    p.add_argument("--model-complexity", type=int, default=2)
    p.add_argument("--skip-connections", action="store_true", default=None,
                   help="override for legacy checkpoints without "
                        "hparams.json (hparams-carrying checkpoints "
                        "rebuild their trained configuration themselves)")
    p.add_argument("--variant", default=None,
                   choices=["base", "film", "mag", "magdb"],
                   help="override for legacy checkpoints (see above)")
    p.add_argument("--base-dirs", nargs="*", default=None,
                   help="base dir per dataset, aligned with --datasets")
    p.add_argument("--compat", default=None,
                   choices=["native", "cqt_pytorch"],
                   help="transform frame; 'cqt_pytorch' evaluates weights "
                        "trained on the reference frame (released-weights "
                        "eval without going through parity.py). Default: "
                        "the checkpoint's trained frame (else native)")
    p.add_argument("--tables", default=None,
                   help=".npz of measured cqt_pytorch tables "
                        "(tools/calibrate_cqt_compat.py); default: analytic "
                        "compat construction")
    p.add_argument("--log-path", default=None)
    args = p.parse_args()

    tables = None
    if args.tables:
        from timbre_trap_tpu.transform import load_tables
        tables = load_tables(args.tables)

    model = load_model(
        args.checkpoint,
        overrides=dict(transform_compat=args.compat, compat_tables=tables,
                       skip_connections=args.skip_connections,
                       variant=args.variant),
        defaults=dict(sample_rate=args.sample_rate,
                      n_octaves=args.n_octaves,
                      bins_per_octave=args.bins_per_octave, secs_per_block=3,
                      latent_size=args.latent_size,
                      model_complexity=args.model_complexity))

    from timbre_trap_tpu.data.datasets.MixedMultiPitch import (
        URMP as URMP_Mixtures, Bach10 as Bach10_Mixtures, Su, TRIOS)
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import GuitarSet

    urmp_val_splits = ["01", "02", "12", "13", "24", "25", "31", "38", "39"]
    registry = {
        "Bach10": lambda base: Bach10_Mixtures(
            base_dir=base, splits=None, sample_rate=args.sample_rate,
            cqt=model.sliCQ),
        "URMP": lambda base: URMP_Mixtures(
            base_dir=base, splits=urmp_val_splits,
            sample_rate=args.sample_rate, cqt=model.sliCQ),
        "Su": lambda base: Su(base_dir=base, splits=None,
                              sample_rate=args.sample_rate, cqt=model.sliCQ),
        "TRIOS": lambda base: TRIOS(base_dir=base, splits=None,
                                    sample_rate=args.sample_rate,
                                    cqt=model.sliCQ),
        "GuitarSet": lambda base: GuitarSet(
            base_dir=base, splits=["05"], sample_rate=args.sample_rate,
            cqt=model.sliCQ),
    }

    multipliers = {"reconstruction": 1, "transcription": 1, "consistency": 1}
    base_dirs = args.base_dirs or [None] * len(args.datasets)
    for name, base in zip(args.datasets, base_dirs):
        eval_set = registry[name](base)
        results = evaluate(model, eval_set, multipliers)
        print_and_log(f"[{name}] {results}", args.log_path)


if __name__ == "__main__":
    main()
