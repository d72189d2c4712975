"""Native (C++) audio loader vs the numpy/scipy reference path."""

import os

import numpy as np
import pytest

from timbre_trap_tpu.data.io import save_wav
from timbre_trap_tpu.data.io import native
from timbre_trap_tpu.data.io.wav import load_audio


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _sine(sr, secs=1.0, f=440.0, amp=0.5):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_native_decode_matches_scipy(tmp_path):
    path = str(tmp_path / "t.wav")
    save_wav(path, _sine(8000), 8000)
    nat, sr_n = native.load_audio_native(path, sample_rate=None,
                                         normalize=False)
    os.environ["TT_TPU_NATIVE_AUDIO"] = "0"
    try:
        ref, sr_r = load_audio(path, sample_rate=None, normalize=False)
    finally:
        os.environ.pop("TT_TPU_NATIVE_AUDIO")
    assert sr_n == sr_r == 8000
    assert nat.shape == ref.shape
    np.testing.assert_allclose(nat, ref, atol=1e-6)


def test_native_resample_quality(tmp_path):
    """Resampled sine must stay a clean sine (SNR > 40 dB vs ideal)."""
    sr_in, sr_out, f = 44100, 22050, 1000.0
    path = str(tmp_path / "t.wav")
    save_wav(path, _sine(sr_in, 1.0, f), sr_in)
    audio, sr = native.load_audio_native(path, sample_rate=sr_out,
                                         normalize=False)
    assert sr == sr_out
    assert abs(audio.shape[-1] - sr_out) <= 2
    n = audio.shape[-1]
    t = np.arange(n) / sr_out
    ideal = 0.5 * np.sin(2 * np.pi * f * t)
    # Ignore filter edge transients
    a, b = audio[0, 500:n - 500], ideal[500:n - 500]
    # align amplitude (window gain)
    g = np.dot(a, b) / np.dot(b, b)
    snr = 10 * np.log10(np.sum(b**2) / np.sum((a / g - b) ** 2))
    assert snr > 40.0, f"SNR {snr:.1f} dB"


def test_native_normalize(tmp_path):
    path = str(tmp_path / "t.wav")
    save_wav(path, _sine(8000, amp=0.3), 8000)
    audio, _ = native.load_audio_native(path, normalize=True)
    assert np.abs(audio).max() == pytest.approx(1.0, abs=1e-5)


def test_native_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.wav")
    open(path, "wb").write(b"not a wav file at all")
    with pytest.raises(RuntimeError):
        native.load_audio_native(path)


def test_default_path_uses_native(tmp_path):
    """load_audio must produce identical results whichever backend serves it."""
    path = str(tmp_path / "t.wav")
    save_wav(path, _sine(16000), 16000)
    via_default, _ = load_audio(path, sample_rate=16000)
    os.environ["TT_TPU_NATIVE_AUDIO"] = "0"
    try:
        via_scipy, _ = load_audio(path, sample_rate=16000)
    finally:
        os.environ.pop("TT_TPU_NATIVE_AUDIO")
    np.testing.assert_allclose(via_default, via_scipy, atol=1e-6)
