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


# --------------------------------------------------------------------- #
# MP3 (libmpg123 decode; fixtures encoded on the fly via libmp3lame)    #
# --------------------------------------------------------------------- #

def _lame():
    import ctypes
    try:
        return ctypes.CDLL("libmp3lame.so.0")
    except OSError:
        return None


def encode_mp3(path, pcm16, sr, channels=1):
    """Encode int16 PCM ((N,) mono or (N, 2) stereo) to an MP3 file."""
    import ctypes

    lame = _lame()
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    lame.lame_set_in_samplerate(gf, sr)
    lame.lame_set_num_channels(gf, channels)
    lame.lame_set_brate(gf, 64 * channels)
    if channels == 1:
        lame.lame_set_mode(gf, 3)  # MONO
    assert lame.lame_init_params(gf) >= 0
    pcm16 = np.ascontiguousarray(pcm16, dtype=np.int16)
    n_frames = pcm16.shape[0]
    buf = ctypes.create_string_buffer(pcm16.size * 2 + 7200)
    ptr = pcm16.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
    if channels == 1:
        n = lame.lame_encode_buffer(gf, ptr, None, n_frames, buf, len(buf))
    else:
        n = lame.lame_encode_buffer_interleaved(gf, ptr, n_frames, buf,
                                                len(buf))
    assert n >= 0, f"lame encode failed ({n})"
    data = buf.raw[:n]
    n = lame.lame_encode_flush(gf, buf, len(buf))
    data += buf.raw[:n]
    lame.lame_close(gf)
    with open(path, "wb") as fh:
        fh.write(data)


mp3_mark = pytest.mark.skipif(
    not (native.available() and native.mp3_available() and _lame()),
    reason="libmpg123/libmp3lame unavailable")


@mp3_mark
def test_mp3_decode_round_trip(tmp_path):
    """Lossy round trip: decoded sine must correlate ~1 with the original."""
    sr, f = 22050, 440.0
    sig = _sine(sr, 2.0, f)
    path = str(tmp_path / "t.mp3")
    encode_mp3(path, (sig * 32767).astype(np.int16), sr)
    audio, fs = native.load_mp3_native(path, sample_rate=None,
                                       normalize=False)
    assert fs == sr
    x = audio[0]
    # mp3 pads with encoder/decoder delay; find the lag then correlate.
    lag = max(range(0, 4000),
              key=lambda k: float(np.dot(x[k:k + 8192], sig[:8192])))
    r = np.corrcoef(x[lag:lag + 20000], sig[:20000])[0, 1]
    assert r > 0.99, f"correlation {r}"
    assert abs(len(x) - len(sig)) < sr // 4  # no gross length error


@mp3_mark
def test_mp3_stereo_downmix_resample_normalize(tmp_path):
    """load_audio dispatch: stereo mp3 -> mono, resampled, peak-normalized."""
    sr = 44100
    sig = _sine(sr, 1.0, 500.0, amp=0.4)
    stereo = np.stack([sig, 0.5 * sig], axis=1)
    path = str(tmp_path / "t.mp3")
    encode_mp3(path, (stereo * 32767).astype(np.int16), sr, channels=2)
    audio, fs = load_audio(path, sample_rate=22050)
    assert fs == 22050
    assert audio.shape[0] == 1
    assert np.abs(audio).max() == pytest.approx(1.0, abs=1e-5)
    assert abs(audio.shape[-1] - 22050) < 22050 // 4


@mp3_mark
def test_mp3_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.mp3")
    open(path, "wb").write(b"definitely not mpeg audio")
    with pytest.raises(RuntimeError):
        native.load_mp3_native(path)


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
