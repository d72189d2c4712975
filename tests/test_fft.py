"""Tests for the matmul-based mixed-radix FFT (timbre_trap_tpu/ops/fft.py)."""

import numpy as np
import pytest

from timbre_trap_tpu.ops import fft as mfft


@pytest.mark.parametrize("n", [8, 150, 294, 441, 1024, 66150 // 21, 66150])
def test_fft_matches_numpy(n, rng):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    got = np.asarray(mfft.fft(x))
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    assert np.allclose(got, ref, atol=1e-3 * scale)


@pytest.mark.parametrize("n", [8, 150, 441, 1024, 66150])
def test_ifft_matches_numpy(n, rng):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))).astype(np.complex64)
    got = np.asarray(mfft.ifft(x))
    ref = np.fft.ifft(x)
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.allclose(got, ref, atol=1e-3 * scale)


@pytest.mark.parametrize("n", [16, 150, 1024, 66150])
def test_rfft_irfft_round_trip(n, rng):
    x = rng.standard_normal((3, n)).astype(np.float32)
    X = np.asarray(mfft.rfft(x))
    ref = np.fft.rfft(x)
    assert X.shape == (3, n // 2 + 1)
    assert np.allclose(X, ref, atol=1e-3 * np.abs(ref).max())
    back = np.asarray(mfft.irfft(X, n))
    assert np.allclose(back, x, atol=1e-3)


def test_rfft_rejects_complex(rng):
    x = rng.standard_normal((4,)) + 1j * rng.standard_normal((4,))
    with pytest.raises(ValueError):
        mfft.rfft(x)


def test_fft_axis_argument(rng):
    x = rng.standard_normal((150, 3)).astype(np.float32)
    got = np.asarray(mfft.fft(x, axis=0))
    ref = np.fft.fft(x, axis=0)
    assert np.allclose(got, ref, atol=1e-3 * np.abs(ref).max())


def test_prime_leaf_direct_dft(rng):
    # 521 is prime and > MAX_LEAF: exercises the direct-DFT fallback.
    x = rng.standard_normal((521,)).astype(np.float32)
    got = np.asarray(mfft.fft(x))
    ref = np.fft.fft(x)
    assert np.allclose(got, ref, atol=1e-3 * np.abs(ref).max())
