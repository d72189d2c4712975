"""One-command BASELINE parity table for the released reference checkpoint.

Reproduces the reference evaluation protocol
(``/root/reference/experiments/evaluate.py:29-48,113-127``) on TPU with the
released ``tt-orig.pt`` weights:

    python experiments/parity.py --checkpoint /path/to/tt-orig.pt \
        --datasets Bach10 URMP Su TRIOS GuitarSet \
        --base-dirs /data/Bach10 /data/URMP /data/Su /data/TRIOS /data/GuitarSet \
        --out parity_results.json

The model runs on the ``cqt_pytorch``-compatible transform frame
(``transform/design.py:design_cqt_pytorch``) — the frame the checkpoint was
trained on — with the torch state_dict imported layout-exactly
(``interop/torch_import.py``). Pass ``--tables`` (from
``tools/calibrate_cqt_compat.py``) to pin the frame to a measured install of
the ``cqt_pytorch`` package instead of the analytic rebuild.

Emits one row per evaluation set — MPE F1 (mir_eval multipitch,
0.5-semitone tolerance) and reconstruction SDR — the "Parity targets" table
of ``BASELINE.md``. Everything except the checkpoint and corpora ships in
this repo; the recipe is execution-blocked only on those assets.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.eval.evaluation import evaluate
from timbre_trap_tpu.interop import import_torch_state_dict, load_torch_checkpoint
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.utils import print_and_log

# Reference evaluation protocol (reference experiments/train.py:177,292-331).
URMP_VAL_SPLITS = ["01", "02", "12", "13", "24", "25", "31", "38", "39"]


def build_eval_sets(names, base_dirs, sample_rate, cqt):
    from timbre_trap_tpu.data.datasets.MixedMultiPitch import (
        TRIOS, Bach10 as Bach10_Mixtures, Su, URMP as URMP_Mixtures)
    from timbre_trap_tpu.data.datasets.SoloMultiPitch import GuitarSet

    registry = {
        "Bach10": lambda base: Bach10_Mixtures(
            base_dir=base, splits=None, sample_rate=sample_rate, cqt=cqt),
        "URMP": lambda base: URMP_Mixtures(
            base_dir=base, splits=URMP_VAL_SPLITS, sample_rate=sample_rate,
            cqt=cqt),
        "Su": lambda base: Su(base_dir=base, splits=None,
                              sample_rate=sample_rate, cqt=cqt),
        "TRIOS": lambda base: TRIOS(base_dir=base, splits=None,
                                    sample_rate=sample_rate, cqt=cqt),
        "GuitarSet": lambda base: GuitarSet(
            base_dir=base, splits=["05"], sample_rate=sample_rate, cqt=cqt),
    }
    return [(name, registry[name](base))
            for name, base in zip(names, base_dirs)]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="released reference .pt checkpoint (tt-orig.pt)")
    p.add_argument("--datasets", nargs="+",
                   default=["Bach10", "URMP", "Su", "TRIOS", "GuitarSet"],
                   choices=["Bach10", "URMP", "Su", "TRIOS", "GuitarSet"])
    p.add_argument("--base-dirs", nargs="*", default=None,
                   help="base dir per dataset, aligned with --datasets")
    p.add_argument("--tables", default=None,
                   help=".npz of measured cqt_pytorch tables "
                        "(tools/calibrate_cqt_compat.py); default: analytic "
                        "compat construction")
    p.add_argument("--compat", default="cqt_pytorch",
                   choices=["cqt_pytorch", "native"],
                   help="transform frame; 'native' quantifies how much the "
                        "checkpoint depends on the training frame")
    # Released-model hyperparameters (reference experiments/train.py:39-161).
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--n-octaves", type=int, default=9)
    p.add_argument("--bins-per-octave", type=int, default=60)
    p.add_argument("--secs-per-block", type=float, default=3.0)
    p.add_argument("--latent-size", type=int, default=128)
    p.add_argument("--model-complexity", type=int, default=2)
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--log-path", default=None)
    args = p.parse_args()

    tables = None
    if args.tables:
        from timbre_trap_tpu.transform import load_tables
        tables = load_tables(args.tables)

    model = TimbreTrap(
        sample_rate=args.sample_rate, n_octaves=args.n_octaves,
        bins_per_octave=args.bins_per_octave,
        secs_per_block=args.secs_per_block, latent_size=args.latent_size,
        model_complexity=args.model_complexity,
        transform_compat=args.compat, compat_tables=tables)

    state_dict = load_torch_checkpoint(args.checkpoint)
    model.params = import_torch_state_dict(state_dict, model.params)
    print_and_log(f"imported {len(state_dict)} tensors from "
                  f"{args.checkpoint} onto the {args.compat} frame",
                  args.log_path)

    base_dirs = args.base_dirs or [None] * len(args.datasets)
    if len(base_dirs) != len(args.datasets):
        raise SystemExit("--base-dirs must align with --datasets")

    multipliers = {"reconstruction": 1, "transcription": 1, "consistency": 1}
    table = {}
    for name, eval_set in build_eval_sets(args.datasets, base_dirs,
                                          args.sample_rate, model.sliCQ):
        results = evaluate(model, eval_set, multipliers)
        table[name] = {k: float(v) for k, v in results.items()}
        print_and_log(f"[{name}] f1={results.get('mpe/f1-score', float('nan')):.4f} "
                      f"sdr={results.get('reconstruction/SDR', float('nan')):.2f} dB",
                      args.log_path)

    header = f"| set | mpe/f1-score | reconstruction SDR (dB) |"
    print_and_log(header, args.log_path)
    print_and_log("|---|---|---|", args.log_path)
    for name, res in table.items():
        print_and_log(
            f"| {name} | {res.get('mpe/f1-score', float('nan')):.4f} "
            f"| {res.get('reconstruction/SDR', float('nan')):.2f} |",
            args.log_path)

    if args.out:
        with open(args.out, "w") as fh:
            json.dump({"checkpoint": args.checkpoint, "compat": args.compat,
                       "results": table}, fh, indent=2)
        print_and_log(f"wrote {args.out}", args.log_path)


if __name__ == "__main__":
    main()
