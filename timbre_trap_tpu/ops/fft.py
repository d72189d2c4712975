"""Matmul-based mixed-radix FFT for TPU.

Why not ``jnp.fft``: the TPU compiler lowers non-power-of-2 FFTs to a dense
DFT matmul at FULL length — for the timbre-trap block length of 66150
samples that is a 66150x66150 matrix (17.5 GB) and an instant OOM. The MXU,
however, is extremely good at *small* dense matmuls, so the right TPU-native
formulation is classic Cooley-Tukey with matmul leaves:

    FFT_{N1*N2} = (DFT_{N1} matmul)  o  twiddle  o  (DFT_{N2} matmul)

applied recursively until every leaf is <= ``MAX_LEAF``. For N = 66150 =
294 * 225 this is two ~(300 x 300) matmuls per stage — a few hundred MFLOPs
that the MXU eats for breakfast, with no giant intermediate.

All matmuls run in float32 with ``Precision.HIGHEST`` so accumulation error
stays ~sqrt(N)*eps (empirically > 100 dB round-trip SNR).

Complex arithmetic is decomposed into real matmuls explicitly (real inputs
then cost half), since complex dtype support is weaker on some TPU stacks.
"""

import contextlib
import threading
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["fft", "ifft", "rfft", "irfft", "fft_precision"]

# Largest DFT computed as a single dense matmul. 1024 keeps the whole
# coefficient-axis FFT (M = 1024) in ONE MXU matmul — measured faster on
# v5e than a 32x32 Cooley-Tukey split (1.21 ms vs 1.68 ms at (540, 1024)).
MAX_LEAF = 1024
_PRECISION = lax.Precision.HIGHEST
# Thread-local: concurrent tracing threads must not leak a fast 'default'
# override into an exactness-critical trace (or pop each other's entries).
_TLS = threading.local()


def _override_stack():
    if not hasattr(_TLS, "stack"):
        _TLS.stack = [None]
    return _TLS.stack


@contextlib.contextmanager
def fft_precision(precision):
    """Trace-time override of the FFT matmul precision.

    Default is HIGHEST (exact transform, 134 dB round trips). Wrapping a
    jitted function body in ``fft_precision("default")`` lets a consumer
    that does not need exactness (e.g. transcription features feeding
    tanh-magnitude activations) run the DFT matmuls at the fast TPU bf16
    rate. Applies at TRACE time — wrap the traced body, not the call.
    The override is confined to the current thread.
    """
    stack = _override_stack()
    stack.append(precision)
    try:
        yield
    finally:
        stack.pop()


def _prec():
    return _override_stack()[-1] or _PRECISION


def _factor_pairs(n):
    """Split n = a * b with a, b as balanced as possible (a <= b)."""
    best = None
    a = int(np.sqrt(n))
    while a >= 2:
        if n % a == 0:
            best = (a, n // a)
            break
        a -= 1
    return best


@lru_cache(maxsize=None)
def _plan(n):
    """Recursive factorization plan: either ('leaf', n) or ('split', n1, n2)."""
    if n <= MAX_LEAF:
        return ("leaf", n)
    pair = _factor_pairs(n)
    if pair is None or pair[0] == 1:
        # prime — fall back to a direct DFT matmul (documented O(n^2) path)
        return ("leaf", n)
    return ("split", pair[0], pair[1])


@lru_cache(maxsize=None)
def _dft_mats(n, sign):
    """Real/imag parts of the (n, n) DFT matrix with exponent sign."""
    j = np.arange(n)
    ang = sign * 2.0 * np.pi * np.outer(j, j) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def _twiddles(n, n1, n2, sign):
    """Twiddle factors W_n^{sign * j1 * k2} of shape (n1, n2)."""
    j1 = np.arange(n1)
    k2 = np.arange(n2)
    ang = sign * 2.0 * np.pi * np.outer(j1, k2) / n
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _cmatmul(xr, xi, mr, mi):
    """(xr + i*xi) @ (mr + i*mi)^T over the last axis; xi may be None (real input)."""
    mr = jnp.asarray(mr)
    mi = jnp.asarray(mi)
    if xi is None:
        yr = jnp.einsum("...j,kj->...k", xr, mr, precision=_prec())
        yi = jnp.einsum("...j,kj->...k", xr, mi, precision=_prec())
    else:
        yr = (jnp.einsum("...j,kj->...k", xr, mr, precision=_prec())
              - jnp.einsum("...j,kj->...k", xi, mi, precision=_prec()))
        yi = (jnp.einsum("...j,kj->...k", xr, mi, precision=_prec())
              + jnp.einsum("...j,kj->...k", xi, mr, precision=_prec()))
    return yr, yi


def _fft_last(xr, xi, n, sign):
    """DFT over the last axis (length n); returns (real, imag) parts."""
    kind = _plan(n)
    if kind[0] == "leaf":
        mr, mi = _dft_mats(n, sign)
        return _cmatmul(xr, xi, mr, mi)

    _, n1, n2 = kind
    batch = xr.shape[:-1]
    # x2[..., j2, j1] = x[..., n1*j2 + j1]
    xr2 = xr.reshape(*batch, n2, n1)
    xi2 = xi.reshape(*batch, n2, n1) if xi is not None else None
    # inner DFT over j2: move j2 to last axis
    ar, ai = _fft_last(jnp.swapaxes(xr2, -1, -2),
                       None if xi2 is None else jnp.swapaxes(xi2, -1, -2),
                       n2, sign)                     # (..., j1, k2)
    # twiddle W_n^{sign * j1 * k2}
    tr, ti = _twiddles(n, n1, n2, sign)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    # outer DFT over j1: move j1 to last axis
    cr, ci = _fft_last(jnp.swapaxes(br, -1, -2), jnp.swapaxes(bi, -1, -2),
                       n1, sign)                     # (..., k2, k1)
    # X[..., n2*k1 + k2] = C[..., k2, k1]
    cr = jnp.swapaxes(cr, -1, -2).reshape(*batch, n)
    ci = jnp.swapaxes(ci, -1, -2).reshape(*batch, n)
    return cr, ci


def _split_complex(x):
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    return x.astype(jnp.float32), None


def fft(x, axis=-1):
    """Complex (or real-input) DFT along ``axis``; returns complex64."""
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    xr, xi = _split_complex(x)
    yr, yi = _fft_last(xr, xi, x.shape[-1], sign=-1.0)
    return jnp.moveaxis(lax.complex(yr, yi), -1, axis)


def ifft(x, axis=-1):
    """Inverse DFT along ``axis`` (includes the 1/n factor); returns complex64."""
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    xr, xi = _split_complex(x)
    yr, yi = _fft_last(xr, xi, n, sign=+1.0)
    inv = jnp.float32(1.0 / n)
    return jnp.moveaxis(lax.complex(yr * inv, yi * inv), -1, axis)


def rfft(x, axis=-1):
    """Real-input DFT along ``axis``, keeping bins [0, n//2]; complex64.

    The input must be real; the two leaf matmuls per stage needed for a real
    signal make this ~2x cheaper than a complex FFT of the same length.
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    xr, xi = _split_complex(x)
    if xi is not None:
        raise ValueError("rfft expects real input")
    yr, yi = _fft_last(xr, None, n, sign=-1.0)
    out = lax.complex(yr[..., : n // 2 + 1], yi[..., : n // 2 + 1])
    return jnp.moveaxis(out, -1, axis)


def irfft(x, n, axis=-1):
    """Inverse of :func:`rfft` for even ``n``: hermitian-extend, IDFT, real part."""
    if n % 2 != 0:
        raise NotImplementedError("irfft currently supports even n only")
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    xr, xi = _split_complex(x)
    if xi is None:
        xi = jnp.zeros_like(xr)
    # full spectrum: [X_0 .. X_{n/2}, conj(X_{n/2-1}) .. conj(X_1)]
    fr = jnp.concatenate([xr, xr[..., -2:0:-1]], axis=-1)
    fi = jnp.concatenate([xi, -xi[..., -2:0:-1]], axis=-1)
    yr, _ = _fft_last(fr, fi, n, sign=+1.0)
    return jnp.moveaxis(yr * jnp.float32(1.0 / n), -1, axis)
