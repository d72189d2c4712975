"""Tests for the invertible sliCQ/CQT transform (SURVEY.md §7 step 1).

Acceptance criteria from the survey: round-trip SNR > ~60 dB, exact
frame/time bookkeeping math, to_real/to_complex involution, rectangular
(F, max_window_length-per-block) output shape with power-of-2 window length.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from timbre_trap_tpu.transform import CQT, design_slicq, hz_to_midi, midi_to_hz


def snr_db(reference, estimate):
    reference = np.asarray(reference, dtype=np.float64)
    estimate = np.asarray(estimate, dtype=np.float64)
    noise = reference - estimate
    return 10.0 * np.log10(np.sum(reference**2) / max(np.sum(noise**2), 1e-300))


def test_plan_shapes_default(default_cqt):
    plan = default_cqt.plan
    assert plan.n_bins == 540
    assert plan.block_length == 66150
    # power-of-2 rounding of the widest window support
    assert plan.max_window_length & (plan.max_window_length - 1) == 0
    assert plan.max_window_length >= 512
    # analysis tables cover every bin; default config gets the aligned path
    assert plan.band_win.shape == (540, plan.max_window_length)
    assert plan.alignment == 128
    assert np.all(plan.band_lo % 128 == 0)
    assert plan.scatter_idx.shape == (2, plan.block_length // 2 + 1)


def test_partition_of_unity(small_cqt):
    plan = small_cqt.plan
    # Reconstruct S(f) = sum_k w_k(f)^2 from the synthesis tables.
    S = np.sum(plan.scatter_dual.astype(np.float64) ** 2, axis=0)
    assert np.allclose(S, 1.0, atol=1e-6)


def test_round_trip_noise(small_cqt, rng):
    L = small_cqt.block_length
    audio = rng.standard_normal((2, 1, 3 * L)).astype(np.float32)
    coeffs = small_cqt.encode(audio)
    assert coeffs.shape == (2, 1, small_cqt.n_bins, 3 * small_cqt.max_window_length)
    recon = small_cqt.decode_raw(coeffs)
    assert snr_db(audio, recon) > 60.0


def test_round_trip_default_config(default_cqt, rng):
    L = default_cqt.block_length
    audio = rng.standard_normal((1, 1, L)).astype(np.float32)
    recon = default_cqt.decode_raw(default_cqt.encode(audio))
    assert snr_db(audio, recon) > 60.0


def test_round_trip_sinusoids(small_cqt):
    """Harmonic content (the musical case) must round-trip, too."""
    sr = small_cqt.sample_rate
    L = small_cqt.block_length
    t = np.arange(2 * L) / sr
    audio = sum(0.3 * np.sin(2 * np.pi * f * t) for f in (261.63, 329.63, 392.0))
    audio = audio[None, None, :].astype(np.float32)
    recon = small_cqt.decode_raw(small_cqt.encode(audio))
    assert snr_db(audio, recon) > 60.0


def test_sinusoid_peak_bin(small_cqt):
    """Energy of a pure tone must localize at the correct CQT bin."""
    sr = small_cqt.sample_rate
    L = small_cqt.block_length
    target_midi = 69.0  # A440
    f = float(midi_to_hz(target_midi))
    t = np.arange(L) / sr
    audio = np.sin(2 * np.pi * f * t)[None, None, :].astype(np.float32)
    mag = np.asarray(CQT.to_magnitude(small_cqt.forward(audio)))[0]
    profile = mag.mean(axis=-1)
    peak_midi = small_cqt.midi_freqs[int(np.argmax(profile))]
    assert abs(peak_midi - target_midi) <= 12 / small_cqt.bins_per_octave


def test_coefficient_scale(small_cqt):
    """A full-scale sinusoid should produce O(1) coefficients."""
    sr, L = small_cqt.sample_rate, small_cqt.block_length
    t = np.arange(L) / sr
    audio = np.sin(2 * np.pi * 440.0 * t)[None, None, :].astype(np.float32)
    mag = np.asarray(CQT.to_magnitude(small_cqt.forward(audio)))
    assert 0.25 < mag.max() < 4.0


def test_to_real_complex_involution(small_cqt, rng):
    c = (rng.standard_normal((2, 1, small_cqt.n_bins, 8))
         + 1j * rng.standard_normal((2, 1, small_cqt.n_bins, 8))).astype(np.complex64)
    real = CQT.to_real(c)
    assert real.shape == (2, 2, small_cqt.n_bins, 8)
    back = CQT.to_complex(real)
    assert np.allclose(np.asarray(back), c[:, 0])


def test_to_magnitude(rng):
    x = rng.standard_normal((2, 2, 5, 7)).astype(np.float32)
    mag = np.asarray(CQT.to_magnitude(x))
    ref = np.sqrt(x[:, 0] ** 2 + x[:, 1] ** 2)
    assert np.allclose(mag, ref, atol=1e-5)


def test_to_decibels():
    mag = np.array([[[1.0, 0.1], [0.01, 1e-8]]], dtype=np.float32)
    db = np.asarray(CQT.to_decibels(mag))
    assert db.max() == pytest.approx(1.0)
    assert db.min() == pytest.approx(0.0)  # 80 dB floor
    assert db[0, 0, 1] == pytest.approx(1.0 - 20 / 80, abs=1e-5)


def test_frame_time_math(default_cqt):
    cqt = default_cqt
    assert cqt.get_expected_samples(3.0) == 66150
    assert cqt.get_expected_samples(-1.0) == 0
    # ceil(samples / block) * max_window_length semantics (cqtwrapper.py:255-273)
    M = cqt.max_window_length
    assert cqt.get_expected_frames(66150) == M
    assert cqt.get_expected_frames(66151) == int(np.ceil(66151 / 66150 * M))
    assert cqt.get_expected_frames(2 * 66150) == 2 * M
    times = cqt.get_times(4)
    assert np.allclose(times, np.arange(4) * cqt.hop_length / cqt.sample_rate)


def test_pad_to_block_length(small_cqt):
    L = small_cqt.block_length
    audio = jnp.ones((1, 1, L + 5))
    padded = small_cqt.pad_to_block_length(audio)
    assert padded.shape[-1] == 2 * L
    assert float(jnp.sum(jnp.abs(padded[..., L + 5:]))) == 0.0
    same = small_cqt.pad_to_block_length(jnp.ones((1, 1, 2 * L)))
    assert same.shape[-1] == 2 * L


def test_midi_freqs(default_cqt):
    freqs = default_cqt.get_midi_freqs()
    assert len(freqs) == 540
    fmin_midi = hz_to_midi((22050 / 2) / 2**9)
    assert freqs[0] == pytest.approx(float(fmin_midi))
    # 60 bins per octave -> 0.2 semitones per bin
    assert freqs[1] - freqs[0] == pytest.approx(0.2)


def test_hz_midi_round_trip():
    f = np.array([27.5, 440.0, 4186.0])
    assert np.allclose(midi_to_hz(hz_to_midi(f)), f)


def test_gradients_flow_through_magnitude(small_cqt, rng):
    """to_real/to_complex/magnitude must be differentiable (used in losses)."""
    import jax

    x = rng.standard_normal((1, 2, small_cqt.n_bins, 4)).astype(np.float32)

    def loss(v):
        return jnp.sum(CQT.to_magnitude(v))

    g = jax.grad(loss)(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_design_rejects_odd_block():
    with pytest.raises(ValueError):
        design_slicq(1000, 2, 4, 999)


def test_encode_non_block_multiple(small_cqt, rng):
    """Non-multiple inputs pad internally and truncate the frame axis to
    ceil(samples/block * M) — the reference frame-count contract."""
    L, M = small_cqt.block_length, small_cqt.max_window_length
    n = L // 3 + 7
    audio = rng.standard_normal((1, 1, n)).astype(np.float32)
    coeffs = small_cqt.encode(audio)
    assert coeffs.shape[-1] == small_cqt.get_expected_frames(n)
    # Prefix frames must agree with the padded-audio encode.
    padded = np.pad(audio, [(0, 0), (0, 0), (0, L - n)])
    full = small_cqt.encode(padded)
    assert np.allclose(np.asarray(coeffs),
                       np.asarray(full)[..., :coeffs.shape[-1]], atol=1e-5)
