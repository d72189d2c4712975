"""Offline frame-sensitivity study for the ``cqt_pytorch`` compat frame.

The compat frame (``transform/design.py:design_cqt_pytorch``) is an analytic
rebuild of the external package the released reference checkpoint was
trained on (pinned only by its call-sites,
``/root/reference/timbre_trap/framework/cqtwrapper.py:31-48``); no live
install exists in this environment to calibrate against
(``transform/calibrate.py`` pins the truth the moment one does). This study
bounds the residual risk of each analytic convention choice NUMERICALLY:

1. train a model to convergence on the baseline compat frame
   (deterministic synthetic polyphony — the ``eval/quality.py`` corpus),
2. evaluate the SAME weights on perturbed frames, one convention at a time:
     * ``floor`` (vs round) crop starts,
     * ``symmetric`` (vs periodic/torch-default) Hann windows,
     * window lengths rounded one bin longer / shorter,
     * the ``native`` exact frame (a full frame swap, for scale),
3. report MPE F1 and reconstruction SDR per frame.

A small F1/SDR delta for a convention means trained weights barely depend
on that choice (an analytic mis-guess there would not break imported
weights); a large delta marks the conventions calibration must pin first.
Results are published in ``docs/PARITY.md`` ("Compat-frame sensitivity").

Usage:
    python tools/frame_sensitivity.py                 # flagship geometry, TPU
    python tools/frame_sensitivity.py --steps 120 --backend pallas_bf16
    python tools/frame_sensitivity.py --small --backend flax   # CPU-sized
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def analytic_tables(sample_rate, n_octaves, bins_per_octave, block_length,
                    start_rounding="round", hann="periodic", length_delta=0):
    """The compat frame's analytic window tables with convention knobs.

    Baseline knobs reproduce ``design_cqt_pytorch(tables=None)`` exactly
    (asserted below); each perturbation flips ONE convention the analytic
    rebuild had to guess (design.py:299-315).
    """
    n_bins = n_octaves * bins_per_octave
    nyquist = sample_rate / 2.0
    half = block_length // 2
    fmin = nyquist / (2.0 ** n_octaves)
    center = fmin * 2.0 ** (np.arange(n_bins, dtype=np.float64)
                            / bins_per_octave)
    q_factor = 1.0 / (2.0 ** (1.0 / bins_per_octave)
                      - 2.0 ** (-1.0 / bins_per_octave))
    pos = center * block_length / sample_rate
    width = pos / q_factor
    lengths = np.maximum(np.ceil(width).astype(np.int64) + length_delta, 2)
    rounder = np.floor if start_rounding == "floor" else np.round
    starts = rounder(pos - lengths / 2.0).astype(np.int64)
    starts = np.clip(starts, 0, np.maximum(half + 1 - lengths, 0))
    if hann == "periodic":
        windows = [0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
                   for n in lengths]
    else:  # symmetric (scipy.signal.windows.hann(sym=True) convention)
        windows = [0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n)
                                      / max(n - 1, 1))
                   for n in lengths]
    M = 1 << int(np.ceil(np.log2(lengths.max())))
    return {"starts": starts, "windows": windows, "M": M}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--n-tracks", type=int, default=8)
    p.add_argument("--backend", default="pallas_bf16",
                   help="train-step conv backend (flax on CPU)")
    p.add_argument("--small", action="store_true",
                   help="CPU-sized geometry (8 kHz, 5 oct x 12) instead of "
                        "the flagship 22.05 kHz 9x60")
    p.add_argument("--synthesis", action="store_true",
                   help="perturb DECODE-path conventions (dual "
                        "normalization, uncovered bins, coefficient scale) "
                        "instead of analysis windows — the reconstruction-"
                        "SDR counterpart of the analysis study "
                        "(VERDICT r4 #6)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.data.pitch import PitchDataset
    from timbre_trap_tpu.eval import signal_distortion_ratio
    from timbre_trap_tpu.eval.multipitch import MAX_FREQ
    from timbre_trap_tpu.eval.quality import synthesize_polyphony
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.ops.peaks import peak_mask
    from timbre_trap_tpu.train import (TrainConfig, init_train_state,
                                       make_train_step)
    from timbre_trap_tpu.transform.design import design_cqt_pytorch, midi_to_hz
    from timbre_trap_tpu.utils import (MultipitchEvaluator,
                                       enable_persistent_compilation_cache,
                                       to_array)

    enable_persistent_compilation_cache()

    if args.small:
        hp = dict(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                  secs_per_block=0.5, latent_size=16, model_complexity=1)
    else:
        hp = dict(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                  secs_per_block=3, latent_size=128, model_complexity=2)
    block_length = int(hp["secs_per_block"] * hp["sample_rate"])

    # Sanity: the baseline knobs reproduce the shipped analytic frame.
    base_tables = analytic_tables(hp["sample_rate"], hp["n_octaves"],
                                  hp["bins_per_octave"], block_length)
    shipped = design_cqt_pytorch(hp["sample_rate"], hp["n_octaves"],
                                 hp["bins_per_octave"], block_length)
    rebuilt = design_cqt_pytorch(hp["sample_rate"], hp["n_octaves"],
                                 hp["bins_per_octave"], block_length,
                                 tables=base_tables)
    np.testing.assert_array_equal(shipped.band_lo, rebuilt.band_lo)
    np.testing.assert_allclose(shipped.band_win, rebuilt.band_win, atol=1e-6)

    # ---- 1. train to convergence on the baseline compat frame ----------- #
    model = TimbreTrap(transform_compat="cqt_pytorch", **hp)
    audio, targets, freqs = synthesize_polyphony(model.sliCQ, args.n_tracks,
                                                 args.seed)
    cfg = TrainConfig(multiplier_consistency=0.0)
    backend = args.backend
    if jax.default_backend() != "tpu" and backend.startswith("pallas"):
        print(f"# no TPU: falling back to flax backend", file=sys.stderr)
        backend = "flax"
    step = jax.jit(make_train_step(model, cfg, mpe_batch_size=args.batch,
                                   conv_backend=backend))
    params, opt = init_train_state(model, cfg)
    audio_d, targets_d = jnp.asarray(audio), jnp.asarray(targets)
    order = np.random.default_rng(args.seed + 1)
    for i in range(args.steps):
        idx = order.permutation(args.n_tracks)[:args.batch]
        params, opt, metrics = step(params, opt, audio_d[idx],
                                    targets_d[idx], args.lr)
    loss = float(metrics["loss/total"])
    print(f"# trained {args.steps} steps on the baseline compat frame, "
          f"loss={loss:.4f}")
    assert np.isfinite(loss)

    # ---- 2. evaluate the SAME weights on perturbed frames --------------- #
    if args.synthesis:
        # Decode-path conventions (VERDICT r4 #6; design_cqt_pytorch's
        # synthesis-convention keys — reference cqtwrapper.py:184-213).
        # Analysis is IDENTICAL across these variants, so transcription F1
        # cannot move (asserted below): the deltas isolate reconstruction.
        variants = [
            ("baseline (canonical dual, zero uncovered)", "cqt_pytorch",
             None),
            ("transpose dual (no 1/S)", "cqt_pytorch",
             {"dual": "transpose"}),
            ("amplitude-normalized dual (1/Σ|w|)", "cqt_pytorch",
             {"dual": "amplitude"}),
            ("uncovered-bin passthrough", "cqt_pytorch",
             {"uncovered": "passthrough"}),
            ("per-bin ifft scale (len_k/M)", "cqt_pytorch",
             {"coeff_scale": "per_bin_len"}),
        ]
    else:
        variants = [
        ("baseline (round starts, periodic Hann)", "cqt_pytorch", None),
        ("floor crop starts", "cqt_pytorch",
         analytic_tables(hp["sample_rate"], hp["n_octaves"],
                         hp["bins_per_octave"], block_length,
                         start_rounding="floor")),
        ("symmetric Hann", "cqt_pytorch",
         analytic_tables(hp["sample_rate"], hp["n_octaves"],
                         hp["bins_per_octave"], block_length,
                         hann="symmetric")),
        ("window length +1", "cqt_pytorch",
         analytic_tables(hp["sample_rate"], hp["n_octaves"],
                         hp["bins_per_octave"], block_length,
                         length_delta=+1)),
        ("window length -1", "cqt_pytorch",
         analytic_tables(hp["sample_rate"], hp["n_octaves"],
                         hp["bins_per_octave"], block_length,
                         length_delta=-1)),
        ("native exact frame", "native", None),
    ]

    times = model.sliCQ.get_times(
        model.sliCQ.get_expected_frames(audio.shape[-1]))
    valid_mask = np.asarray(midi_to_hz(model.sliCQ.midi_freqs)) > MAX_FREQ

    print(f"{'frame variant':>42} {'mpe F1':>8} {'SDR dB':>8} "
          f"{'frame SDR':>9}")
    rows = []
    baseline_f1 = None
    for name, compat, tables in variants:
        m = TimbreTrap(transform_compat=compat, compat_tables=tables, **hp)
        assert m.sliCQ.max_window_length == model.sliCQ.max_window_length, \
            f"{name}: frame geometry changed; weights not comparable"
        m.params = params

        # Pure-frame round trip (no model): the decode convention's own
        # error floor on this audio.
        rt = np.asarray(m.sliCQ.decode(m.sliCQ.encode(audio_d)))
        frame_sdr = float(np.mean(
            [signal_distortion_ratio(rt[i, 0, :audio.shape[-1]], audio[i, 0])
             for i in range(args.n_tracks)]))

        acts = m.transcribe(audio_d)
        acts = jnp.where(jnp.asarray(valid_mask)[None, :, None], 0.0, acts)
        masks = to_array(peak_mask(acts)).astype(np.float64)
        evaluator = MultipitchEvaluator()
        for i in range(args.n_tracks):
            est = PitchDataset.activations_to_multi_pitch(
                masks[i], m.sliCQ.midi_freqs, peaks_only=False)
            ref = [np.asarray(freqs[i], np.float64)] * len(times)
            evaluator.append_results(evaluator.evaluate(times, est,
                                                        times, ref))
        f1 = float(evaluator.average_results()[0]["mpe/f1-score"])

        rec = np.asarray(m.reconstruct(audio_d))
        sdrs = [float(signal_distortion_ratio(rec[i, 0, :audio.shape[-1]],
                                              audio[i, 0]))
                for i in range(args.n_tracks)]
        sdr = float(np.mean(sdrs))
        rows.append((name, f1, sdr, frame_sdr))
        print(f"{name:>42} {f1:>8.4f} {sdr:>8.2f} {frame_sdr:>9.2f}")
        if args.synthesis:
            # Analysis identical across synthesis variants -> F1 must not
            # move (decode is not in the transcription path).
            if baseline_f1 is None:
                baseline_f1 = f1
            assert abs(f1 - baseline_f1) < 1e-9, (name, f1, baseline_f1)

    print("\n# markdown (docs/PARITY.md):")
    print("| frame variant | mpe F1 | reconstruction SDR (dB) "
          "| pure-frame SDR (dB) |")
    print("|---|---|---|---|")
    for name, f1, sdr, frame_sdr in rows:
        print(f"| {name} | {f1:.4f} | {sdr:.2f} | {frame_sdr:.2f} |")


if __name__ == "__main__":
    main()
