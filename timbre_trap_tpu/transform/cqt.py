"""Public CQT wrapper with the reference API surface, on JAX.

API parity with ``timbre_trap/framework/cqtwrapper.py`` (constructor
signature :15-48, ``forward`` :50-72, ``to_real`` :74-97, ``to_complex``
:99-120, ``to_magnitude`` :122-141, ``to_decibels`` :143-182, ``decode``
:184-213, ``pad_to_block_length`` :215-233, ``get_expected_samples``
:235-253, ``get_expected_frames`` :255-273, ``get_times`` :275-293,
``get_midi_freqs`` :295-308) — but the transform itself is the TPU-native
NSGT from :mod:`.design` / :mod:`.nsgt`, not a port of ``cqt_pytorch``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from .design import design_cqt_pytorch, design_slicq
from .nsgt import build_slicq_fns

__all__ = ["CQT"]


class CQT:
    """Invertible sliCQ transform with timbre-trap bookkeeping helpers.

    ``compat`` selects the frame construction:

    * ``"native"`` (default) — the exact partition-of-unity frame from
      :func:`~timbre_trap_tpu.transform.design.design_slicq` (~134 dB
      round trips; better than the reference transform).
    * ``"cqt_pytorch"`` — the compat frame replicating the external
      ``cqt_pytorch`` package the released ``tt-orig.pt`` checkpoint was
      trained on (constant-Q Hann windows, plain-ifft coefficient scale,
      canonical-dual synthesis; approximately invertible like the
      reference). Pass ``compat_tables`` (from
      :mod:`timbre_trap_tpu.transform.calibrate`) to pin the windows to a
      measured install of the package instead of the analytic rebuild.
    """

    def __init__(self, n_octaves, bins_per_octave, sample_rate, secs_per_block,
                 compat="native", compat_tables=None):
        block_length = int(secs_per_block * sample_rate)
        if compat in (None, "native"):
            if compat_tables is not None:
                raise ValueError("compat_tables requires compat='cqt_pytorch'")
            self.plan = design_slicq(
                sample_rate=sample_rate,
                n_octaves=n_octaves,
                bins_per_octave=bins_per_octave,
                block_length=block_length,
                power_of_2_length=True,
            )
        elif compat == "cqt_pytorch":
            self.plan = design_cqt_pytorch(
                sample_rate=sample_rate,
                n_octaves=n_octaves,
                bins_per_octave=bins_per_octave,
                block_length=block_length,
                power_of_2_length=True,
                tables=compat_tables,
            )
        else:
            raise ValueError(f"unknown compat mode: {compat!r}")
        self.compat = self.plan.variant

        self.sample_rate = sample_rate
        self.n_octaves = n_octaves
        self.bins_per_octave = bins_per_octave
        self.block_length = self.plan.block_length
        self.max_window_length = self.plan.max_window_length
        # Fractional hop (samples) between coefficient frames (cqtwrapper.py:40).
        self.hop_length = self.block_length / self.max_window_length
        self.n_bins = self.plan.n_bins
        # Center frequency (MIDI) of each bin (cqtwrapper.py:45-48).
        self.midi_freqs = np.asarray(self.plan.midi_freqs)

        self._encode, self._decode = build_slicq_fns(self.plan)
        self._encode_jit = jax.jit(self._encode)
        self._decode_jit = jax.jit(self._decode)
        self._decode_real_jit = jax.jit(self._decode_real)
        self._decode_complex_jit = jax.jit(self._decode_normalized)
        # Fully-jitted forward: complex intermediates must not hit eager ops
        # (unimplemented on some TPU runtimes — see the verify skill notes).
        self._forward_jit = jax.jit(
            lambda a: self.to_real(self._encode(jax.lax.stop_gradient(a))))

    # ------------------------------------------------------------------ #
    # Core transform                                                     #
    # ------------------------------------------------------------------ #

    def encode(self, audio):
        """Real audio (B x 1 x T) -> complex coefficients (B x 1 x F x T')."""
        return self._encode_jit(jnp.asarray(audio))

    def encode_raw(self, audio):
        """Un-jitted encode for composition inside larger jitted programs."""
        return self._encode(audio)

    def decode_raw(self, coefficients):
        """Un-jitted complex synthesis for composition inside jit."""
        return self._decode(coefficients)

    def forward(self, audio):
        """Audio (B x 1 x T) -> real/imag coefficients (B x 2 x F x T').

        Like the reference (``cqtwrapper.py:65`` runs under ``no_grad``),
        gradients do not flow through the analysis transform. Runs as one
        jitted program (the complex intermediate never goes eager).
        """
        return self._forward_jit(jnp.asarray(audio))

    __call__ = forward

    def _decode_normalized(self, coefficients):
        """Complex (B,1,F,T) -> audio with infinity-norm normalization
        (cqtwrapper.py:209-211). Runs fully inside one jit."""
        audio = self._decode(jax.lax.stop_gradient(coefficients))
        peak = jnp.max(jnp.abs(audio))
        return jnp.where(peak > 0, audio / peak, audio)

    def _decode_real(self, coefficients):
        """Real (B,2,F,T) -> audio; complex conversion fused into the jit.

        Complex arrays cannot cross the host<->device boundary on this TPU
        runtime, and eager complex ops on large arrays are slow — so the
        whole real->complex->synthesis->normalize chain is one program.
        """
        complex_coeffs = self.to_complex(coefficients)[:, None]
        return self._decode_normalized(complex_coeffs)

    def decode(self, coefficients):
        """Coefficients (B x 2 [real] OR B x 1 [complex] x F x T) -> audio (B x 1 x T).

        Applies the reference's per-batch infinity-norm normalization
        (``cqtwrapper.py:209-211``).
        """
        coefficients = jnp.asarray(coefficients)
        if jnp.issubdtype(coefficients.dtype, jnp.complexfloating):
            return self._decode_complex_jit(coefficients)
        return self._decode_real_jit(coefficients)

    # ------------------------------------------------------------------ #
    # Coefficient conversions (pure, differentiable)                     #
    # ------------------------------------------------------------------ #

    @staticmethod
    def to_real(coefficients):
        """Complex (B x 1 x F x T) -> stacked real/imag (B x 2 x F x T).

        Channel order [real, imag] matches ``cqtwrapper.py:74-97``.
        """
        coefficients = jnp.squeeze(coefficients, axis=-3)
        return jnp.stack([jnp.real(coefficients), jnp.imag(coefficients)], axis=-3)

    @staticmethod
    def to_complex(coefficients):
        """Real/imag (B x 2 x F x T) -> complex (B x F x T) (cqtwrapper.py:99-120)."""
        real = jax.lax.index_in_dim(coefficients, 0, axis=-3, keepdims=False)
        imag = jax.lax.index_in_dim(coefficients, 1, axis=-3, keepdims=False)
        return jax.lax.complex(real, imag)

    @staticmethod
    def to_magnitude(coefficients):
        """L2 magnitude over the real/imag channel dim (cqtwrapper.py:122-141)."""
        return jnp.linalg.norm(coefficients, axis=-3)

    @staticmethod
    def to_decibels(magnitude, rescale=True):
        """Amplitude -> dB with 80 dB floor; optionally rescaled to [0, 1].

        Per-track processing as in ``cqtwrapper.py:143-182`` (AmplitudeToDB
        with ``top_db=80`` followed by 0 dB ceiling and [0, 1] rescale).
        """
        magnitude = jnp.asarray(magnitude)

        def _one(m):
            db = 20.0 * jnp.log10(jnp.maximum(m, 1e-10))
            db_max = jnp.max(db)
            db = jnp.maximum(db, db_max - 80.0)
            if rescale:
                db = 1.0 + (db - db_max) / 80.0
            return db

        return jax.vmap(_one)(magnitude)

    # ------------------------------------------------------------------ #
    # Bookkeeping                                                        #
    # ------------------------------------------------------------------ #

    def pad_to_block_length(self, audio):
        """Zero-pad audio (… x T) up to the next block multiple (cqtwrapper.py:215-233)."""
        audio = jnp.asarray(audio)
        pad = -audio.shape[-1] % self.block_length
        if pad == 0:
            return audio
        widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
        return jnp.pad(audio, widths)

    def get_expected_samples(self, t):
        """Seconds -> samples, rounded down (cqtwrapper.py:235-253)."""
        return int(max(0, t) * self.sample_rate)

    def get_expected_frames(self, num_samples):
        """Samples -> coefficient frames (cqtwrapper.py:255-273)."""
        return math.ceil((num_samples / self.block_length) * self.max_window_length)

    def get_times(self, n_frames):
        """Time (s) of each coefficient frame (cqtwrapper.py:275-293)."""
        return np.arange(n_frames) * self.hop_length / self.sample_rate

    def get_midi_freqs(self):
        """Center frequency (MIDI) of each bin (cqtwrapper.py:295-308)."""
        return self.midi_freqs
