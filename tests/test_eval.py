"""Tests for the multipitch metric suite, processing utils, and evaluator."""

import numpy as np
import pytest

from timbre_trap_tpu.eval import multipitch as mp
from timbre_trap_tpu.utils import (
    MultipitchEvaluator,
    filter_non_peaks,
    threshold,
)


def _hz(*midis):
    return np.array([440.0 * 2 ** ((m - 69) / 12) for m in midis])


def test_perfect_estimate():
    times = np.arange(4) * 0.01
    freqs = [_hz(60), _hz(60, 64), np.array([]), _hz(67)]
    scores = mp.evaluate(times, freqs, times, freqs)
    assert scores["Precision"] == 1.0
    assert scores["Recall"] == 1.0
    assert scores["Accuracy"] == 1.0
    assert scores["Total Error"] == 0.0
    assert scores["Chroma Accuracy"] == 1.0


def test_empty_estimate():
    times = np.arange(3) * 0.01
    ref = [_hz(60), _hz(62), _hz(64)]
    est = [np.array([])] * 3
    scores = mp.evaluate(times, ref, times, est)
    assert scores["Precision"] == 0.0
    assert scores["Recall"] == 0.0
    assert scores["Miss Error"] == 1.0
    assert scores["Total Error"] == 1.0


def test_tolerance_window():
    times = np.array([0.0])
    ref = [_hz(60)]
    within = [_hz(60.4)]   # 0.4 st off -> hit at 0.5 st tolerance
    outside = [_hz(60.6)]  # 0.6 st off -> miss
    assert mp.evaluate(times, ref, times, within)["Recall"] == 1.0
    assert mp.evaluate(times, ref, times, outside)["Recall"] == 0.0


def test_octave_error_chroma():
    times = np.array([0.0, 0.01])
    ref = [_hz(60), _hz(55)]
    est = [_hz(72), _hz(55)]  # first is an octave error
    scores = mp.evaluate(times, ref, times, est)
    assert scores["Recall"] == pytest.approx(0.5)
    assert scores["Chroma Recall"] == pytest.approx(1.0)
    assert scores["Substitution Error"] == pytest.approx(0.5)


def test_false_alarm_error():
    times = np.array([0.0])
    ref = [_hz(60)]
    est = [_hz(60, 64, 67)]  # 2 extra notes
    scores = mp.evaluate(times, ref, times, est)
    assert scores["Recall"] == 1.0
    assert scores["Precision"] == pytest.approx(1 / 3)
    assert scores["False Alarm Error"] == pytest.approx(2.0)


def test_duplicate_estimates_not_double_counted():
    """Optimal matching: two estimates can't both match one reference."""
    times = np.array([0.0])
    ref = [_hz(60)]
    est = [_hz(60.0, 60.1)]
    scores = mp.evaluate(times, ref, times, est)
    assert scores["Recall"] == 1.0
    assert scores["Precision"] == pytest.approx(0.5)


def test_resampling_to_ref_grid():
    ref_times = np.array([0.0, 0.1, 0.2])
    est_times = np.array([0.0, 0.05, 0.1, 0.15, 0.2])
    ref = [_hz(60)] * 3
    est = [_hz(60), _hz(62), _hz(60), _hz(62), _hz(60)]
    scores = mp.evaluate(ref_times, ref, est_times, est)
    assert scores["Recall"] == 1.0  # nearest frames line up


def test_resample_multipitch_out_of_range():
    out = mp.resample_multipitch(np.array([1.0, 2.0]),
                                 [_hz(60), _hz(62)],
                                 np.array([0.0, 1.0, 2.0, 3.0]))
    assert len(out[0]) == 0 and len(out[3]) == 0
    assert np.allclose(out[1], _hz(60)) and np.allclose(out[2], _hz(62))


def test_evaluator_accumulation():
    ev = MultipitchEvaluator(tolerance=0.5)
    times = np.array([0.0, 0.01])
    ref = [_hz(60), _hz(64)]
    r1 = ev.evaluate(times, ref, times, ref)
    assert r1["mpe/f1-score"] == pytest.approx(1.0, abs=1e-9)
    ev.append_results(r1)
    ev.append_results(ev.evaluate(times, [np.array([])] * 2, times, ref))
    mean, std = ev.average_results()
    assert mean["mpe/f1-score"] == pytest.approx(0.5, abs=1e-6)
    assert std["mpe/precision"] == pytest.approx(0.5, abs=1e-6)


def test_threshold():
    arr = np.array([[0.2, 0.5, 0.8]])
    out = threshold(arr, 0.5)
    assert np.array_equal(out, [[0.0, 1.0, 1.0]])


def test_filter_non_peaks():
    col = np.array([[0.1], [0.5], [0.3], [0.7], [0.7]])
    out = filter_non_peaks(col)
    # 0.5 is a peak (0.1 < 0.5 > 0.3); plateau 0.7,0.7 is not strict
    assert out[1, 0] == 0.5
    assert out[0, 0] == 0.0 and out[2, 0] == 0.0
    assert out[3, 0] == 0.0 and out[4, 0] == 0.0


def test_filter_non_peaks_edges():
    col = np.array([[0.9], [0.1], [0.8]])
    out = filter_non_peaks(col)
    assert out[0, 0] == 0.9  # edge peak vs implicit zero row
    assert out[2, 0] == 0.8


def test_device_peak_mask_matches_numpy(rng):
    """ops.peaks (XLA) and the Pallas kernel (interpret) must match the
    numpy post-process exactly."""
    from timbre_trap_tpu.ops.peaks import peak_mask
    from timbre_trap_tpu.ops.pallas_kernels import peak_mask_pallas

    a = rng.uniform(size=(2, 60, 300)).astype(np.float32)
    ref = threshold(filter_non_peaks(a), 0.5).astype(np.uint8)
    assert np.array_equal(np.asarray(peak_mask(a)), ref)
    assert np.array_equal(np.asarray(peak_mask_pallas(a, interpret=True)), ref)


def test_masked_peak_estimates_boundary_bin():
    """Invalid-frequency zeroing must happen BEFORE peak-picking (reference
    evaluate.py:105-110): an invalid bin that dominates its valid neighbor
    suppresses the neighbor's peak unless it is zeroed first."""
    from timbre_trap_tpu.eval.evaluation import masked_peak_estimates

    F, T = 8, 4
    acts = np.zeros((1, F, T), np.float32)
    acts[0, 5] = 0.6   # valid boundary bin — a peak once bin 6 is zeroed
    acts[0, 6] = 0.9   # invalid bin (above MAX_FREQ), dominates bin 5
    invalid = np.zeros(F, bool)
    invalid[6:] = True

    with pytest.warns(RuntimeWarning, match="invalid frequencies"):
        mask = masked_peak_estimates(acts, invalid)

    assert mask.shape == (F, T)
    assert np.all(mask[5] == 1.0)      # promoted peak survives thresholding
    assert not mask[invalid].any()      # nothing reported at invalid bins

    # No invalid activations -> no warning, bin 6 keeps its peak.
    acts2 = acts.copy()
    acts2[0, 6] = 0.0
    acts2[0, 4] = 0.9
    mask2 = masked_peak_estimates(acts2, invalid)
    assert np.all(mask2[4] == 1.0) and not mask2[5].any()


# --------------------------------------------------------------------- #
# Quality regression harness (eval/quality.py, tracked by bench.py)     #
# --------------------------------------------------------------------- #

def test_synthesize_polyphony_deterministic():
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.eval import synthesize_polyphony

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    a1, t1, f1 = synthesize_polyphony(m.sliCQ, 3, seed=7)
    a2, t2, f2 = synthesize_polyphony(m.sliCQ, 3, seed=7)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(t1, t2)
    assert a1.shape == (3, 1, m.sliCQ.block_length)
    F = m.sliCQ.n_bins
    M = m.sliCQ.get_expected_frames(m.sliCQ.block_length)
    assert t1.shape == (3, F, M)
    # Every drawn pitch is on the representable grid (no rasterizer warning).
    lo, hi = m.sliCQ.midi_freqs[0], m.sliCQ.midi_freqs[-1]
    from timbre_trap_tpu.transform.design import hz_to_midi
    for hz in f1:
        midis = np.asarray(hz_to_midi(hz))
        assert np.all((midis >= lo) & (midis <= hi))


def test_quality_f1_learns():
    """The tracked metric must be computable and show actual learning."""
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.eval import quality_f1

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    saved = m.params
    f1 = quality_f1(m, n_tracks=4, steps=40, lr=2e-3, seed=0)
    assert m.params is saved  # model left untouched
    assert 0.0 <= f1 <= 1.0
    assert f1 > 0.2, f"synthetic-polyphony F1 did not rise ({f1})"


def test_quality_f1_consistency_branch():
    """The consistency-on variant (the flagship recipe's loss surface)
    trains without NaNs and stays computable — this exercises the
    consistency-branch gradients bench.py tracks (mpe_f1_consistency)."""
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.eval import quality_f1

    m = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                   secs_per_block=0.5, latent_size=16, model_complexity=1)
    f1 = quality_f1(m, n_tracks=4, steps=20, lr=2e-3, seed=0,
                    multiplier_consistency=1.0)
    assert 0.0 <= f1 <= 1.0
    assert f1 > 0.0, "consistency-on training collapsed (F1 == 0)"
