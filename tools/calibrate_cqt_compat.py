"""Measure a live ``cqt_pytorch`` install and pin the compat frame to it.

The released reference checkpoint (``tt-orig.pt``) was trained on
coefficients from the external ``cqt_pytorch`` package
(``/root/reference/timbre_trap/framework/cqtwrapper.py:2,31-35``), which is
not installable offline. The compat frame (``transform/design.py:
design_cqt_pytorch``) rebuilds that transform analytically; this tool makes
it *bit-faithful* the moment the real package exists:

    python tools/calibrate_cqt_compat.py --out tables_22050_9x60_3s.npz

It instantiates ``cqt_pytorch.CQT`` exactly as the reference wrapper does,
black-box-identifies its per-bin crop starts and window values by probing
every DFT bin (``transform/calibrate.py:identify_transform`` — exact for any
transform of the ifft-of-windowed-crop form, regardless of the package
version's rounding choices), and saves the measured tables. Feed them back
with::

    CQT(..., compat="cqt_pytorch", compat_tables=load_tables(path))
    TimbreTrap(..., transform_compat="cqt_pytorch", compat_tables=...)

or pass ``--tables`` to ``experiments/parity.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from timbre_trap_tpu.transform import save_tables, tables_from_cqt_pytorch


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--sample-rate", type=int, default=22050)
    p.add_argument("--n-octaves", type=int, default=9)
    p.add_argument("--bins-per-octave", type=int, default=60)
    p.add_argument("--secs-per-block", type=float, default=3.0,
                   help="reference trains on 3-s sliCQ blocks (train.py:100)")
    p.add_argument("--batch", type=int, default=64,
                   help="probe frequencies per encode call")
    args = p.parse_args()

    try:
        tables = tables_from_cqt_pytorch(
            n_octaves=args.n_octaves, bins_per_octave=args.bins_per_octave,
            sample_rate=args.sample_rate, secs_per_block=args.secs_per_block,
            batch=args.batch)
    except ImportError as exc:
        raise SystemExit(
            f"cqt_pytorch (or torch) is not importable here: {exc}\n"
            "Run this tool in an environment with the package installed; "
            "offline, the analytic compat construction is used instead.")

    save_tables(args.out, tables)
    lengths = [len(w) for w in tables["windows"]]
    print(f"measured {len(lengths)} bins, M={tables['M']}, "
          f"window lengths {min(lengths)}..{max(lengths)} -> {args.out}")


if __name__ == "__main__":
    main()
