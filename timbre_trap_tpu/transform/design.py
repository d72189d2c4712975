"""Host-side construction of the invertible sliCQ (NSGT) transform plan.

This is a from-scratch, TPU-first design of the invertible constant-Q
transform used by the reference framework (reference: the external
``cqt_pytorch`` package pinned by ``timbre_trap/framework/cqtwrapper.py:31-35``
and the sliCQ paper, arXiv 1210.0084). Nothing here is a translation of that
package — the construction below is derived directly from painless
nonstationary-Gabor-frame (NSGT) theory and is engineered so that both
analysis and synthesis lower onto TPU-friendly primitives:

* one real FFT per audio block,
* a static gather + elementwise window multiply (precomputed index maps),
* a batch of small fixed-length inverse FFTs (one per CQT bin),
* and, for synthesis, TWO static gathers instead of a scatter-add
  (every spectrum bin is covered by at most two adjacent CQT windows),
  which avoids TPU-hostile scatter ops entirely.

Window design
-------------
Center frequencies are geometrically spaced over ``n_octaves`` octaves below
Nyquist (reference semantics: ``cqtwrapper.py:43-48``). For neighboring
center positions ``p_{k-1} < p_k < p_{k+1}`` (in DFT-bin units of the block),
bin ``k`` rises as ``sin(pi/2 * t)`` over ``[p_{k-1}, p_k]`` and falls as
``cos(pi/2 * t)`` over ``[p_k, p_{k+1}]``. The lowest window plateaus at 1
down to DC and the highest plateaus up to Nyquist. Consequently

    sum_k w_k(f)^2 == 1   for every frequency f in [0, Nyquist],

i.e. the frame operator is exactly the identity, the canonical dual window
equals the analysis window, and encode->decode is EXACT up to float rounding
(the reference's transform is only approximately invertible).

All bins share a common coefficient length ``max_window_length`` (the sliCQ
"matrix" form) so the output is a dense rectangular (F, T) array — required
by the downstream 2D-conv model and ideal for TPU tiling.
"""

from dataclasses import dataclass, field

import math
import numpy as np

__all__ = ["SlicqPlan", "design_slicq", "design_cqt_pytorch",
           "hz_to_midi", "midi_to_hz"]


def hz_to_midi(frequencies):
    """Convert frequency in Hz to (fractional) MIDI note number."""
    return 12.0 * (np.log2(np.asarray(frequencies, dtype=np.float64)) - np.log2(440.0)) + 69.0


def midi_to_hz(notes):
    """Convert (fractional) MIDI note number to frequency in Hz."""
    return 440.0 * (2.0 ** ((np.asarray(notes, dtype=np.float64) - 69.0) / 12.0))


def _next_power_of_2(x: int) -> int:
    return 1 << max(0, int(math.ceil(math.log2(max(1, x)))))


@dataclass(frozen=True)
class SlicqPlan:
    """Static arrays + scalars fully describing one sliCQ configuration.

    All arrays are host numpy; they are uploaded once as device constants by
    the JAX transform functions. Shapes: F = n_bins, M = max_window_length,
    R = block_length // 2 + 1 (rfft size).
    """

    sample_rate: float
    n_octaves: int
    bins_per_octave: int
    block_length: int
    n_bins: int
    max_window_length: int
    n_rfft: int
    # Analysis (TPU-fast path): every bin reads a CONTIGUOUS spectrum band
    # [band_lo_k, band_lo_k + M) — 128-aligned when alignment == 128 — and
    # the mod-M aliasing roll is folded into a post-IFFT phase ramp:
    #   c_k = IFFT_M(X[lo_k : lo_k+M] * band_win_k) * band_phase_k
    band_lo: np.ndarray = field(repr=False)      # (F,) int32, aligned starts
    band_win: np.ndarray = field(repr=False)     # (F, M) float32
    band_phase: np.ndarray = field(repr=False)   # (F, M) complex64 (incl. scale)
    alignment: int  # lane alignment of band_lo (128 on TPU-friendly configs)
    # Synthesis: spectrum[f] = sum_s Z.flat[scatter_idx[s, f]] * scatter_dual[s, f]
    # where Z is the (F, M) forward FFT of the coefficients (times the design's
    # demodulation convention). S slots = max windows overlapping one bin
    # (2 for the exact design; a few for the Hann compat frame).
    scatter_idx: np.ndarray = field(repr=False)  # (S, R) int32 into flattened (F*M)
    scatter_dual: np.ndarray = field(repr=False)  # (S, R) float32
    # Synthesis window per band, band layout (== band_win for the self-dual
    # exact design; the canonical dual w/S for the compat frame).
    band_dual: np.ndarray = field(repr=False)    # (F, M) float32
    # Bookkeeping
    center_freqs_hz: np.ndarray = field(repr=False)  # (F,) float64
    midi_freqs: np.ndarray = field(repr=False)  # (F,) float64
    scale: float = 1.0  # coefficient scale so O(1) audio -> O(1) coefficients
    variant: str = "native"  # "native" (exact frame) | "cqt_pytorch" (compat)

    @property
    def hop_length(self) -> float:
        # Fractional hop in samples between successive coefficient frames
        # (reference semantics: cqtwrapper.py:40).
        return self.block_length / self.max_window_length


def design_slicq(sample_rate, n_octaves, bins_per_octave, block_length,
                 power_of_2_length=True):
    """Construct the static gather/window/dual arrays for one configuration.

    Parameters mirror the reference ctor (``cqtwrapper.py:31-35``):
    ``block_length = int(secs_per_block * sample_rate)``.
    """
    n_bins = n_octaves * bins_per_octave
    nyquist = sample_rate / 2.0
    half = block_length // 2  # highest rfft bin index (block_length is even in practice)
    if block_length % 2 != 0:
        raise ValueError("block_length must be even")
    n_rfft = half + 1

    # Geometric center frequencies over n_octaves below Nyquist
    # (reference semantics: cqtwrapper.py:45-48).
    fmin = nyquist / (2.0 ** n_octaves)
    center_freqs = fmin * 2.0 ** (np.arange(n_bins, dtype=np.float64) / bins_per_octave)
    midi_freqs = hz_to_midi(fmin) + np.arange(n_bins, dtype=np.float64) / (bins_per_octave / 12.0)

    # Center positions in (fractional) DFT bins of the block spectrum.
    pos = center_freqs * block_length / sample_rate  # strictly < half
    # Window node points: DC below the lowest bin, Nyquist above the highest.
    nodes = np.concatenate(([0.0], pos, [float(half)]))

    # Integer support of each window: [lo_k, hi_k] inclusive.
    lo = np.ceil(nodes[:-2]).astype(np.int64)
    hi = np.floor(nodes[2:]).astype(np.int64)
    lo[0] = 0
    hi[-1] = half
    support = np.maximum(hi - lo + 1, 0)

    max_support = int(support.max())
    if power_of_2_length:
        max_window_length = _next_power_of_2(max_support)
    else:
        max_window_length = max_support
    M = max_window_length

    def window_value(k, f):
        """Analysis window of bin k evaluated at (integer) frequencies f."""
        f = np.asarray(f, dtype=np.float64)
        left, center, right = nodes[k], nodes[k + 1], nodes[k + 2]
        w = np.zeros_like(f)
        if k == 0:
            # Plateau down to DC for full coverage.
            rise = f <= center
            w[rise] = 1.0
        else:
            rise = (f >= left) & (f <= center)
            denom = max(center - left, np.finfo(np.float64).tiny)
            w[rise] = np.sin(0.5 * np.pi * (f[rise] - left) / denom)
        if k == n_bins - 1:
            # Plateau up to Nyquist for full coverage.
            fall = f > center
            w[fall] = 1.0
        else:
            fall = (f > center) & (f <= right)
            denom = max(right - center, np.finfo(np.float64).tiny)
            w[fall] = np.cos(0.5 * np.pi * (f[fall] - center) / denom)
        return w

    # --- Analysis band tables (contiguous slices + phase ramp) -------------
    # Align band starts DOWN to the TPU lane width when the window-length
    # slack allows it (support + 127 <= M) — then the per-bin spectrum read
    # is a 128-aligned contiguous slice, which XLA/Mosaic move at full
    # bandwidth instead of an elementwise gather.
    alignment = 128 if (max_support + 127 <= M and M % 128 == 0) else 1
    band_lo = (lo // alignment) * alignment
    band_lo = np.maximum(band_lo, 0)
    if np.any(hi - band_lo + 1 > M):
        raise AssertionError("aligned band exceeds window length")

    band_win = np.zeros((n_bins, M), dtype=np.float64)
    # Phase ramp undoing the mod-M alias roll: IFFT of the rolled band equals
    # IFFT of the un-rolled band times exp(2i*pi*lo*n/M); fold in the
    # coefficient scale too. (scale defined below.)
    # --- Synthesis tables: per spectrum bin, up to 2 contributing windows --
    contrib_idx = [[] for _ in range(n_rfft)]
    contrib_dual = [[] for _ in range(n_rfft)]

    for k in range(n_bins):
        if support[k] <= 0:
            continue
        f = np.arange(lo[k], hi[k] + 1)
        w = window_value(k, f)
        m = np.mod(f, M)  # alias position inside the length-M coefficient FFT
        band_win[k, f - band_lo[k]] = w
        nz = w > 0.0
        for fi, mi, wi in zip(f[nz], m[nz], w[nz]):
            contrib_idx[fi].append(k * M + mi)
            contrib_dual[fi].append(wi)  # dual == analysis window (S == 1)

    # Verify the partition-of-unity frame condition on the integer grid.
    S = np.zeros(n_rfft)
    for fi in range(n_rfft):
        S[fi] = float(np.sum(np.square(contrib_dual[fi])))
    if not np.allclose(S, 1.0, atol=1e-10):
        raise AssertionError(
            f"frame operator not identity: S in [{S.min()}, {S.max()}]")

    max_contrib = max(len(c) for c in contrib_idx)
    if max_contrib > 2:
        raise AssertionError(
            f"more than two windows overlap one spectrum bin ({max_contrib})")

    scatter_idx = np.zeros((2, n_rfft), dtype=np.int64)
    scatter_dual = np.zeros((2, n_rfft), dtype=np.float64)
    for fi in range(n_rfft):
        for s, (ci, cd) in enumerate(zip(contrib_idx[fi], contrib_dual[fi])):
            scatter_idx[s, fi] = ci
            scatter_dual[s, fi] = cd

    # Coefficient scaling: a unit-amplitude sinusoid at a bin center produces
    # |rfft| = block_length / 2 at that bin; after the length-M inverse FFT the
    # peak coefficient magnitude is (block_length / 2) / M. Scale by 2M/L so a
    # full-scale sinusoid yields coefficients of magnitude ~1 — keeps the
    # autoencoder's regression targets O(1).
    scale = 2.0 * M / block_length

    n_idx = np.arange(M)
    ang = 2.0 * np.pi * np.outer(np.mod(band_lo, M), n_idx) / M
    band_phase = (scale * np.exp(1j * ang)).astype(np.complex64)

    return SlicqPlan(
        sample_rate=float(sample_rate),
        n_octaves=int(n_octaves),
        bins_per_octave=int(bins_per_octave),
        block_length=int(block_length),
        n_bins=int(n_bins),
        max_window_length=int(M),
        n_rfft=int(n_rfft),
        band_lo=band_lo.astype(np.int32),
        band_win=band_win.astype(np.float32),
        band_phase=band_phase,
        alignment=int(alignment),
        scatter_idx=scatter_idx.astype(np.int32),
        scatter_dual=scatter_dual.astype(np.float32),
        band_dual=band_win.astype(np.float32),  # self-dual (S == 1)
        center_freqs_hz=center_freqs,
        midi_freqs=midi_freqs,
        scale=float(scale),
        variant="native",
    )


def design_cqt_pytorch(sample_rate, n_octaves, bins_per_octave, block_length,
                       power_of_2_length=True, tables=None):
    """Construct a ``cqt_pytorch``-compatible sliCQ plan (compat frame).

    The released reference checkpoint (``tt-orig.pt``) was trained on
    coefficients produced by the external ``cqt_pytorch`` package
    (``timbre_trap/framework/cqtwrapper.py:31-35``), whose source is not
    present in this environment. This designer rebuilds that transform's
    *frame* from the construction it documents — the painless NSGT of the
    sliCQ paper (arXiv 1210.0084) with constant-Q Hann windows in the
    frequency domain — pinned to the wrapper-visible behaviors:

    * geometric centers over ``n_octaves`` below Nyquist
      (``cqtwrapper.py:45-48``),
    * constant-Q bandwidths ``Omega_k = xi_k * (2^(1/B) - 2^(-1/B))``
      (Q ~ 43.3 at B = 60),
    * per-bin frequency crops IFFT'd at the common, power-of-2-rounded
      ``max_window_length`` (``power_of_2_length=True``, ``cqtwrapper.py:35``;
      ``hop = block_length / max_window_length``, :40),
    * plain ``ifft`` (1/M) coefficient scaling, baseband demodulation at each
      crop's start bin (coefficients = ``ifft(window * spectrum_crop)``).

    Synthesis uses the canonical dual frame (``w_k / S`` with
    ``S(f) = sum_k w_k(f)^2``) — exact wherever the windows cover the
    spectrum; content below the lowest window (and in sub-bin gaps between
    the narrowest low-frequency windows) is not reconstructable, matching the
    reference transform's documented approximate invertibility.

    ``tables`` — optional measured tables ``{"starts": (F,) int,
    "windows": list/object array of per-bin float window values, "M": int}``
    produced by :mod:`timbre_trap_tpu.transform.calibrate` from a live
    ``cqt_pytorch`` install; when given they override the analytic window
    construction entirely, making the compat mode bit-faithful to whatever
    the installed package actually computes.

    ``tables`` may additionally carry SYNTHESIS-convention keys — the
    decode-path guesses the analytic rebuild had to make for the package's
    ``icqt`` (``cqtwrapper.py:184-213``), each a knob so calibration (or
    the sensitivity study, ``tools/frame_sensitivity.py --synthesis``) can
    pin/perturb them independently of the analysis windows:

    * ``"dual"``: ``"canonical"`` (default; ``conj(w)/S``, ``S = Σ|w|²``),
      ``"transpose"`` (plain ``conj(w)`` overlap-add, no normalization),
      ``"amplitude"`` (``conj(w)/S₁``, ``S₁ = Σ|w|`` — linear- instead of
      power-complementary normalization).
    * ``"uncovered"``: ``"zero"`` (default; spectrum bins no window covers
      reconstruct as 0) or ``"passthrough"`` (no coverage mask).
    * ``"coeff_scale"``: ``"ifft_M"`` (default; every bin's crop is
      IFFT'd at the common length M) or ``"per_bin_len"`` (the package
      normalizes each bin's ifft by its own window length — synthesis
      then carries a per-bin gain ``len_k/M`` relative to the default).
    """
    conventions = {} if tables is None else dict(tables)
    dual_mode = conventions.pop("dual", "canonical")
    uncovered_mode = conventions.pop("uncovered", "zero")
    coeff_scale = conventions.pop("coeff_scale", "ifft_M")
    assert dual_mode in ("canonical", "transpose", "amplitude")
    assert uncovered_mode in ("zero", "passthrough")
    assert coeff_scale in ("ifft_M", "per_bin_len")
    tables = conventions or None

    n_bins = n_octaves * bins_per_octave
    nyquist = sample_rate / 2.0
    if block_length % 2 != 0:
        raise ValueError("block_length must be even")
    half = block_length // 2
    n_rfft = half + 1

    fmin = nyquist / (2.0 ** n_octaves)
    center_freqs = fmin * 2.0 ** (np.arange(n_bins, dtype=np.float64) / bins_per_octave)
    midi_freqs = hz_to_midi(fmin) + np.arange(n_bins, dtype=np.float64) / (bins_per_octave / 12.0)

    if tables is None:
        # Constant-Q bandwidth (Hz): Omega_k = xi_k * (2^(1/B) - 2^(-1/B)) ==
        # xi_{k+1} - xi_{k-1} for geometric spacing — Hann windows at ~2x
        # overlap (the classic 50%-overlap partition).
        q_factor = 1.0 / (2.0 ** (1.0 / bins_per_octave)
                          - 2.0 ** (-1.0 / bins_per_octave))
        pos = center_freqs * block_length / sample_rate      # fractional bins
        width = pos / q_factor                               # support in bins
        lengths = np.maximum(np.ceil(width).astype(np.int64), 2)
        starts = np.round(pos - lengths / 2.0).astype(np.int64)
        # Keep every window inside the one-sided spectrum [0, half].
        starts = np.clip(starts, 0, np.maximum(half + 1 - lengths, 0))
        # Periodic Hann (torch.hann_window default): w[i] = 0.5 - 0.5 cos(2 pi i / n).
        windows = [0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)
                   for n in lengths]
        max_support = int(lengths.max())
        M = _next_power_of_2(max_support) if power_of_2_length else max_support
    else:
        starts = np.asarray(tables["starts"], dtype=np.int64)
        windows = [np.asarray(w) for w in tables["windows"]]
        if len(windows) != n_bins or starts.shape != (n_bins,):
            raise ValueError("measured tables do not match the configuration")
        lengths = np.array([len(w) for w in windows], dtype=np.int64)
        max_support = int(lengths.max())
        M = int(tables.get("M", 0)) or (
            _next_power_of_2(max_support) if power_of_2_length else max_support)
        if max_support > M:
            raise ValueError("measured window longer than max_window_length")

    # Measured tables may carry complex window values (a package convention
    # beyond pure magnitude is still identified exactly by calibrate.py).
    is_complex = any(np.iscomplexobj(w) for w in windows)
    tdtype = np.complex128 if is_complex else np.float64
    out_dtype = np.complex64 if is_complex else np.float32
    windows = [np.asarray(w, dtype=tdtype) for w in windows]

    # Coverage S(f) = sum_k |w_k(f)|^2 on the integer grid; canonical dual.
    S = np.zeros(n_rfft, dtype=np.float64)
    S1 = np.zeros(n_rfft, dtype=np.float64)
    for k in range(n_bins):
        f = np.arange(starts[k], starts[k] + lengths[k])
        S[f] += np.square(np.abs(windows[k]))
        S1[f] += np.abs(windows[k])
    covered = S > 1e-6 * max(float(S.max()), 1e-300)
    S_safe = np.where(covered, S, 1.0)
    S1_safe = np.where(covered, S1, 1.0)

    # Analysis band tables — same aligned contiguous-slice machinery as the
    # exact design; the crop-start demodulation goes into the phase ramp.
    alignment = 128 if (max_support + 127 <= M and M % 128 == 0) else 1
    band_lo = (starts // alignment) * alignment
    band_lo = np.maximum(band_lo, 0)
    if np.any(starts + lengths - band_lo > M):
        raise AssertionError("aligned band exceeds window length")

    band_win = np.zeros((n_bins, M), dtype=tdtype)
    band_dual = np.zeros((n_bins, M), dtype=tdtype)
    n_slots = int(np.max(np.bincount(
        np.concatenate([np.arange(starts[k], starts[k] + lengths[k])
                        for k in range(n_bins)]),
        minlength=n_rfft)))
    contrib_count = np.zeros(n_rfft, dtype=np.int64)
    scatter_idx = np.zeros((n_slots, n_rfft), dtype=np.int64)
    scatter_dual = np.zeros((n_slots, n_rfft), dtype=tdtype)
    for k in range(n_bins):
        f = np.arange(starts[k], starts[k] + lengths[k])
        off = f - band_lo[k]
        w = windows[k]
        if dual_mode == "canonical":
            d = np.conj(w) / S_safe[f]
        elif dual_mode == "amplitude":
            d = np.conj(w) / S1_safe[f]
        else:  # transpose
            d = np.conj(w)
        if uncovered_mode == "zero":
            d = np.where(covered[f], d, 0.0)
        if coeff_scale == "per_bin_len":
            d = d * (lengths[k] / float(M))
        band_win[k, off] = w
        band_dual[k, off] = d
        nz = w != 0.0
        slot = contrib_count[f[nz]]
        scatter_idx[slot, f[nz]] = k * M + (f[nz] - starts[k])
        scatter_dual[slot, f[nz]] = d[nz]
        contrib_count[f[nz]] += 1

    # Demodulate each band at its crop start (cqt_pytorch convention:
    # coefficients = ifft of the zero-padded crop). scale = 1: plain 1/M ifft
    # normalization — the released weights expect this coefficient scale.
    n_idx = np.arange(M)
    ang = -2.0 * np.pi * np.outer(starts - band_lo, n_idx) / M
    band_phase = np.exp(1j * ang).astype(np.complex64)

    return SlicqPlan(
        sample_rate=float(sample_rate),
        n_octaves=int(n_octaves),
        bins_per_octave=int(bins_per_octave),
        block_length=int(block_length),
        n_bins=int(n_bins),
        max_window_length=int(M),
        n_rfft=int(n_rfft),
        band_lo=band_lo.astype(np.int32),
        band_win=band_win.astype(out_dtype),
        band_phase=band_phase,
        alignment=int(alignment),
        scatter_idx=scatter_idx.astype(np.int32),
        scatter_dual=scatter_dual.astype(out_dtype),
        band_dual=band_dual.astype(out_dtype),
        center_freqs_hz=center_freqs,
        midi_freqs=midi_freqs,
        scale=1.0,
        variant="cqt_pytorch",
    )
