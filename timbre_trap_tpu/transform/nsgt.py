"""JAX/XLA execution of the sliCQ plan (analysis + exact synthesis).

The hot path per 3-second block (128-aligned configurations) is:

    analysis:  rfft(L) -> contiguous aligned band slices -> window multiply
               -> ifft(M) batch -> phase ramp (undoes the mod-M alias roll)
    synthesis: inverse phase -> fft(M) batch -> window -> ONE-HOT MATMUL
               accumulating aligned chunks into the spectrum -> irfft(L)

Everything is static-shaped, fuses under ``jax.jit``, and avoids
elementwise gather/scatter entirely on the aligned path (those measured
~60k elements/ms on TPU; aligned 128-lane chunk moves and MXU matmuls run
at full bandwidth). Small unaligned test configurations fall back to plain
gathers. Reference behavior pinned by
``timbre_trap/framework/cqtwrapper.py:50-72,184-213``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fft as mfft

__all__ = ["build_slicq_fns"]


def build_slicq_fns(plan):
    """Return (encode, decode) pure functions closed over device constants.

    encode: real (B, C, T) -> complex64 (B, C, F, T // L * M)
    decode: complex (B, C, F, T_frames) -> real (B, C, T_frames // M * L)

    ``T`` must be a multiple of ``plan.block_length`` (callers pad first —
    reference: ``cqtwrapper.py:215-233``).
    """
    # NOTE: tables stay host-side numpy; they embed as HLO constants at trace
    # time (device arrays would need a device->host copy for constant
    # embedding, which this TPU runtime does not implement for complex64).
    band_win = plan.band_win                       # (F, M) float32
    band_dual = plan.band_dual                     # (F, M) float32 (== win if self-dual)
    band_phase = plan.band_phase                   # (F, M) complex64 (x scale)
    scatter_idx = plan.scatter_idx                 # (S, R) int32
    scatter_dual = plan.scatter_dual               # (S, R) float32
    L = plan.block_length
    M = plan.max_window_length
    F = plan.n_bins
    R = plan.n_rfft
    A = plan.alignment
    inv_scale = jnp.float32(1.0 / plan.scale)

    if A > 1:
        # Aligned path: bands are read as whole 128-lane chunks, so the
        # "gather" is A-sized contiguous block moves — full-bandwidth on TPU
        # instead of an elementwise gather (which measured 9 ms/block).
        S = ((int(plan.band_lo.max()) + M + A - 1) // A) * A
        chunk_idx = ((plan.band_lo[:, None] // A)
                     + np.arange(M // A)[None, :]).reshape(-1)
        chunk_idx = chunk_idx.astype(np.int32)               # (F * M/A,)
        # Synthesis: scatter-add of windowed bands into the spectrum as a
        # ONE-HOT MATMUL over aligned chunks (both elementwise gathers of
        # the table formulation measured ~0.5 s/minute of audio on TPU).
        onehot = np.zeros((S // A, F * (M // A)), np.float32)
        onehot[chunk_idx, np.arange(F * (M // A))] = 1.0
        inv_phase = (np.conj(plan.band_phase)
                     / np.float32(plan.scale) ** 2).astype(np.complex64)
    else:
        # Fallback (small test configs): plain elementwise gather.
        S = int(plan.band_lo.max()) + M
        elem_idx = (plan.band_lo[:, None] + np.arange(M)[None, :]).reshape(-1)
        elem_idx = elem_idx.astype(np.int32)                 # (F * M,)

    def _band_slices(X):
        """X (..., R) complex -> (..., F, M) banded spectrum segments."""
        Xp = jnp.pad(X, [(0, 0)] * (X.ndim - 1) + [(0, S - R)])
        if A > 1:
            chunks = Xp.reshape(*Xp.shape[:-1], S // A, A)
            seg = jnp.take(chunks, chunk_idx, axis=-2)
            return seg.reshape(*Xp.shape[:-1], F, M)
        seg = jnp.take(Xp, elem_idx, axis=-1)
        return seg.reshape(*Xp.shape[:-1], F, M)

    def encode(audio):
        audio = jnp.asarray(audio, dtype=jnp.float32)
        B, C, T = audio.shape
        pad = -T % L
        if pad:
            # Zero-pad to a whole block internally; the frame axis is then
            # truncated to ceil(T / L * M) — the reference's frame-count
            # contract (cqtwrapper.py:255-273) for non-multiple inputs.
            audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
        nb = (T + pad) // L
        x = audio.reshape(B, C, nb, L)
        X = mfft.rfft(x, axis=-1)                                   # (B,C,nb,R)
        Z = _band_slices(X) * band_win                              # (B,C,nb,F,M)
        coeffs = mfft.ifft(Z, axis=-1) * band_phase                 # (B,C,nb,F,M)
        coeffs = jnp.moveaxis(coeffs, -3, -2)                          # (B,C,F,nb,M)
        coeffs = coeffs.reshape(B, C, F, nb * M)
        n_frames = -(-T * M // L)  # ceil(T / L * M)
        return coeffs[..., :n_frames]

    def decode(coefficients):
        coefficients = jnp.asarray(coefficients)
        if not jnp.issubdtype(coefficients.dtype, jnp.complexfloating):
            raise ValueError("decode expects complex coefficients")
        B, C, Fc, Tf = coefficients.shape
        if Fc != F:
            raise ValueError(f"expected {F} bins, got {Fc}")
        if Tf % M != 0:
            raise ValueError(f"{Tf} frames not a multiple of window length {M}")
        nb = Tf // M
        c = coefficients.reshape(B, C, F, nb, M)
        c = jnp.moveaxis(c, -2, -3)                                    # (B,C,nb,F,M)
        if A > 1:
            # Band formulation: undo the phase ramp, forward-FFT back to the
            # un-rolled band representation, window with the dual window
            # (== the analysis window for the exact self-dual design), and
            # accumulate aligned chunks into the spectrum via a dense
            # one-hot matmul (MXU, no scatter/gather).
            y = mfft.fft(c * inv_phase, axis=-1) * band_dual           # (B,C,nb,F,M)
            ych = y.reshape(B, C, nb, F * (M // A), A)
            Xr = jnp.einsum("sc,...ca->...sa", onehot, jnp.real(ych),
                            precision=jax.lax.Precision.HIGHEST)
            Xi = jnp.einsum("sc,...ca->...sa", onehot, jnp.imag(ych),
                            precision=jax.lax.Precision.HIGHEST)
            X = jax.lax.complex(Xr, Xi).reshape(B, C, nb, S)[..., :R]
        else:
            Z = mfft.fft(c, axis=-1) * inv_scale
            Zf = Z.reshape(B, C, nb, F * M)
            X = sum(jnp.take(Zf, scatter_idx[s], axis=-1) * scatter_dual[s]
                    for s in range(scatter_idx.shape[0]))
        x = mfft.irfft(X, n=L, axis=-1)                             # (B,C,nb,L)
        return x.reshape(B, C, nb * L).astype(jnp.float32)

    return encode, decode
