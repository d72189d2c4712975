"""Tests for the invertible sliCQ/CQT transform (SURVEY.md §7 step 1).

Acceptance criteria from the survey: round-trip SNR > ~60 dB, exact
frame/time bookkeeping math, to_real/to_complex involution, rectangular
(F, max_window_length-per-block) output shape with power-of-2 window length.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from timbre_trap_tpu.transform import (CQT, design_cqt_pytorch, design_slicq,
                                       hz_to_midi, identify_transform,
                                       load_tables, midi_to_hz, save_tables)


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


# --------------------------------------------------------------------- #
# cqt_pytorch compat frame (the tt-orig.pt parity path — VERDICT r2 #1)  #
# --------------------------------------------------------------------- #


@pytest.fixture(scope="session")
def compat_cqt():
    from timbre_trap_tpu.transform import CQT

    return CQT(n_octaves=5, bins_per_octave=12, sample_rate=8000,
               secs_per_block=0.5, compat="cqt_pytorch")


def test_compat_flagship_geometry():
    """The compat frame must land on the native (F, M) geometry so trained
    models are interchangeable between frames (VERDICT r2: same geometry,
    different per-bin magnitudes/phases)."""
    plan = design_cqt_pytorch(22050, 9, 60, 66150)
    assert plan.n_bins == 540
    assert plan.max_window_length == 1024
    assert plan.alignment == 128
    assert plan.variant == "cqt_pytorch"
    assert plan.scale == 1.0
    # Constant-Q support: widths grow geometrically with the bin index.
    widths = (plan.band_win > 0).sum(axis=1)
    assert widths[-1] > 100 * max(widths[0], 1)


def test_compat_covered_content_exact(compat_cqt, rng):
    """Canonical-dual synthesis is EXACT on spectrum the windows cover; the
    only loss is content below the lowest window (the reference transform's
    documented approximate invertibility)."""
    plan = compat_cqt.plan
    L, R = plan.block_length, plan.n_rfft
    covered = np.zeros(R, dtype=bool)
    for s in range(plan.scatter_dual.shape[0]):
        covered |= plan.scatter_dual[s] != 0
    assert 0.9 < covered.mean() <= 1.0
    X = (rng.standard_normal(R) + 1j * rng.standard_normal(R)) * covered
    X[0] = X[0].real
    X[-1] = X[-1].real
    x = np.fft.irfft(X, n=L).astype(np.float32)[None, None, :]
    rec = np.asarray(compat_cqt.decode_raw(compat_cqt.encode(x)))
    assert snr_db(x, rec) > 80.0


def test_compat_sinusoid_round_trip(compat_cqt):
    sr, L = compat_cqt.sample_rate, compat_cqt.block_length
    t = np.arange(2 * L) / sr
    audio = sum(0.3 * np.sin(2 * np.pi * f * t) for f in (261.63, 392.0, 1244.5))
    audio = audio[None, None, :].astype(np.float32)
    rec = np.asarray(compat_cqt.decode_raw(compat_cqt.encode(audio)))
    # Approximate reconstruction (leakage into the uncovered low end) — the
    # compat target, unlike the exact native frame.
    assert snr_db(audio, rec) > 30.0


def test_compat_frame_math(compat_cqt):
    M = compat_cqt.max_window_length
    assert M & (M - 1) == 0  # power_of_2_length=True (cqtwrapper.py:35)
    assert compat_cqt.hop_length == compat_cqt.block_length / M
    assert compat_cqt.get_expected_frames(compat_cqt.block_length) == M
    assert len(compat_cqt.get_midi_freqs()) == compat_cqt.n_bins


def test_compat_encode_matches_numpy_reference(default_cqt, rng):
    """The aligned-path compat encode must equal the literal convention:
    coefficients = ifft_M(hann * spectrum_crop) per bin (plain 1/M scale)."""
    from timbre_trap_tpu.transform import CQT

    cqt = CQT(9, 60, 22050, 3, compat="cqt_pytorch")
    plan = cqt.plan
    assert plan.alignment == 128  # this test exists to cover the aligned path
    L, M, F = plan.block_length, plan.max_window_length, plan.n_bins
    audio = rng.standard_normal((1, 1, L)).astype(np.float32)
    ours = np.asarray(cqt.encode(audio))[0, 0]  # (F, M)

    X = np.fft.rfft(audio[0, 0])
    ref = np.zeros((F, M), dtype=np.complex128)
    for k in range(F):
        row = plan.band_win[k]
        nz = np.nonzero(row)[0]
        if nz.size == 0:
            continue
        # Crop start = band_lo + demodulation offset d encoded in the phase
        # ramp exp(-2i*pi*d*n/M) (periodic Hann's leading zero sample means
        # the first NONZERO window sample sits one past the crop start).
        d = int(round(-np.angle(plan.band_phase[k, 1]) * M / (2 * np.pi))) % M
        start = plan.band_lo[k] + d
        h = row[d : nz[-1] + 1]
        crop = np.zeros(M, dtype=np.complex128)
        crop[: h.size] = X[start : start + h.size] * h
        ref[k] = np.fft.ifft(crop)
    denom = np.abs(ref).max()
    assert np.abs(ours - ref).max() / denom < 1e-4


def test_identify_transform_round_trip(rng):
    """Black-box calibration: identify a transform with a DIFFERENT window
    convention (Blackman, floor-started crops, complex per-sample phase) and
    verify the rebuilt compat plan reproduces its encode exactly. When the
    real cqt_pytorch package is importable this same machinery pins the
    compat mode to it bit-faithfully (tools/calibrate_cqt_compat.py)."""
    from timbre_trap_tpu.transform import CQT

    sr, n_oct, bpo, spb = 4000, 3, 4, 0.25
    L = int(spb * sr)
    F = n_oct * bpo
    nyq = sr / 2
    fmin = nyq / 2**n_oct
    centers = fmin * 2 ** (np.arange(F) / bpo)
    pos = centers * L / sr
    q = 1.0 / (2 ** (1 / bpo) - 2 ** (-1 / bpo))
    lengths = np.maximum((pos / q).astype(int) + 1, 3)
    starts = np.maximum(np.floor(pos - lengths / 2).astype(int), 0)  # floor, not round
    M = 1 << int(np.ceil(np.log2(lengths.max())))
    wins = [np.blackman(n) * np.exp(1j * 0.37 * np.arange(n)) for n in lengths]

    def stub_encode(batch):
        X = np.fft.fft(np.asarray(batch, dtype=np.float64), axis=-1)
        out = np.zeros(batch.shape[:2] + (F, M), dtype=np.complex128)
        for k in range(F):
            crop = np.zeros(batch.shape[:2] + (M,), dtype=np.complex128)
            crop[..., : lengths[k]] = (
                X[..., starts[k] : starts[k] + lengths[k]] * wins[k])
            out[..., k, :] = np.fft.ifft(crop, axis=-1)
        return out

    tables = identify_transform(stub_encode, L, F, batch=32)
    assert np.array_equal(tables["starts"], starts)
    assert tables["M"] == M
    for k in range(F):
        # Trailing zero window samples are unobservable (no response) and
        # irrelevant — compare on the padded common support.
        got = np.zeros(lengths[k], dtype=np.complex128)
        got[: len(tables["windows"][k])] = tables["windows"][k]
        assert np.allclose(got, wins[k], atol=1e-6)

    cqt = CQT(n_oct, bpo, sr, spb, compat="cqt_pytorch", compat_tables=tables)
    audio = rng.standard_normal((2, 1, L)).astype(np.float32)
    ours = np.asarray(cqt.encode(audio))
    ref = stub_encode(audio)
    assert np.abs(ours - ref).max() / np.abs(ref).max() < 1e-4


def test_tables_save_load(tmp_path):
    tables = {"starts": np.array([1, 5]), "M": 8,
              "windows": [np.hanning(3), np.blackman(5) * 1j]}
    path = tmp_path / "tables.npz"
    save_tables(path, tables)
    loaded = load_tables(path)
    assert np.array_equal(loaded["starts"], tables["starts"])
    assert loaded["M"] == 8
    for a, b in zip(loaded["windows"], tables["windows"]):
        assert np.allclose(a, b)


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
