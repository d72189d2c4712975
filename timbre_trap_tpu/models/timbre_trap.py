"""Public Timbre-Trap model families: transform + network + inference paths.

API parity with the reference ``TimbreTrap`` module
(``timbre_trap/framework/modules.py:23-393`` and variants :780-1075):
``encode``, ``decode``, ``inference``, ``chunked_inference``,
``to_activations``, ``transcribe``, ``reconstruct``, ``forward`` — but
organized the JAX way: parameters live in an explicit pytree
(``self.params``), all compute paths are pure jitted functions, and the
streaming chunked inference is a ``lax.scan`` with on-device Hann
overlap-add instead of a host loop (reference ``modules.py:204-269``).

Public tensor layouts match the reference (coefficients ``(B, C, F, T)``,
latents ``(B, D, T)``); internally everything is NHWC for TPU.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..transform import CQT
from .modules import TimbreTrapNet

__all__ = ["TimbreTrap", "TimbreTrapFiLM", "TimbreTrapMag", "TimbreTrapMagDB"]


def _nchw_to_nhwc(x):
    return jnp.moveaxis(x, -3, -1)


def _nhwc_to_nchw(x):
    return jnp.moveaxis(x, -1, -3)


class TimbreTrap:
    """Base (real/imaginary coefficient) model with indicator-channel switch."""

    variant = "base"

    def __init__(self, sample_rate, n_octaves, bins_per_octave, secs_per_block=3,
                 latent_size=None, model_complexity=1, skip_connections=False,
                 seed=0, remat=False, fused="auto", transform_compat="native",
                 compat_tables=None):
        self.hparams = dict(sample_rate=sample_rate, n_octaves=n_octaves,
                            bins_per_octave=bins_per_octave,
                            secs_per_block=secs_per_block,
                            latent_size=latent_size,
                            model_complexity=model_complexity,
                            skip_connections=skip_connections,
                            variant=self.variant,
                            transform_compat=transform_compat)
        # Inference conv-stack backend: "auto" runs the fused Pallas level
        # kernels (ops/fused_level.py) on TPU — bf16 storage for transcribe
        # (error on par with XLA's default bf16 multiplies), exact f32 for
        # reconstruction; "f32" forces exact everywhere; "off" keeps the
        # flax/XLA path. CPU always uses the flax path (Pallas interpret
        # mode is test-only). Assigning .fused rebuilds the jitted entry
        # points (the mode is baked into the traced programs).
        self._fused = fused
        # transform_compat="cqt_pytorch" runs the model on the compat frame
        # the released reference checkpoint was trained on (see
        # transform/design.py:design_cqt_pytorch); the TPU execution path is
        # identical either way.
        self.sliCQ = CQT(n_octaves=n_octaves,
                         bins_per_octave=bins_per_octave,
                         sample_rate=sample_rate,
                         secs_per_block=secs_per_block,
                         compat=transform_compat,
                         compat_tables=compat_tables)
        self.net = TimbreTrapNet(feature_size=self.sliCQ.n_bins,
                                 latent_size=latent_size,
                                 model_complexity=model_complexity,
                                 skip_connections=skip_connections,
                                 variant=self.variant,
                                 remat=remat)
        dummy = jnp.zeros((1, self.sliCQ.n_bins, 4, self.net.in_channels), jnp.float32)
        self.params = self.net.init(jax.random.PRNGKey(seed), dummy)["params"]
        self._build_jits()

    def _build_jits(self):
        self._features_jit = jax.jit(self.features_from_audio)
        self._encode_jit = jax.jit(self._encode_fn)
        self._decode_jit = jax.jit(self._decode_fn, static_argnums=3)
        self._forward_jit = jax.jit(self._forward_fn, static_argnums=2)
        self._infer_jit = jax.jit(self._infer_fn, static_argnums=2)
        self._chunked_jit = jax.jit(self._chunked_fn, static_argnums=2)
        self._transcribe_jit = jax.jit(self._transcribe_fn)
        self._reconstruct_jit = jax.jit(self._reconstruct_fn)
        self._piece_jit = jax.jit(self._piece_fn)
        self._piece_recon_jit = jax.jit(self._piece_recon_fn)
        self._seg_f32_jit = jax.jit(self._seg_f32_fn)

    @property
    def fused(self):
        return self._fused

    @fused.setter
    def fused(self, value):
        if value != getattr(self, "_fused", None):
            self._fused = value
            self._build_jits()

    # ------------------------------------------------------------------ #
    # Feature extraction (variant-dependent)                             #
    # ------------------------------------------------------------------ #

    def features_from_audio(self, audio):
        """Audio (B, 1, N) -> network input features, NHWC. Differentiable-free
        (the reference transform runs under no_grad, cqtwrapper.py:65).

        int16 input is accepted and dequantized on device (PCM16 is the
        native format of WAV/MP3 sources; transferring it halves the
        host->device bytes on tunneled runtimes); float16 casts to f32 on
        device (same byte savings with no quantization contract)."""
        audio = jnp.asarray(audio)
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
        audio = jax.lax.stop_gradient(audio.astype(jnp.float32))
        coefficients = self.sliCQ.encode_raw(audio)  # complex (B,1,F,T)
        return self._features_from_complex(coefficients)

    def _features_from_complex(self, coefficients):
        real = CQT.to_real(coefficients)  # (B,2,F,T)
        return _nchw_to_nhwc(real)

    # ------------------------------------------------------------------ #
    # Pure functions (jitted in __init__)                                #
    # ------------------------------------------------------------------ #

    def _encode_fn(self, params, audio):
        features = self.features_from_audio(audio)
        return self.net.apply({"params": params}, features, method="encode")

    def _decode_fn(self, params, latents, embeddings, transcribe):
        return self.net.apply({"params": params}, latents, embeddings, transcribe,
                              method="decode")

    def _forward_fn(self, params, audio, consistency):
        features = self.features_from_audio(audio)
        return self.net.apply({"params": params}, features, consistency)

    def _use_fused(self):
        if self.fused in (False, "off", None):
            return False
        return jax.default_backend() == "tpu"

    def _infer_fn(self, params, audio, transcribe):
        """Single full-length pass audio (B,1,N) -> coefficients (B,C,F,T)."""
        features = self.features_from_audio(audio)
        if self._use_fused():
            from .fused import fused_forward

            dtype = (jnp.bfloat16 if transcribe and self.fused != "f32"
                     else jnp.float32)
            return fused_forward(params, self.net, features, transcribe,
                                 dtype=dtype)
        latents, embeddings, _ = self.net.apply(
            {"params": params}, features, method="encode")
        embeddings = self.net.apply(
            {"params": params}, embeddings, method="apply_skip_connections")
        out = self.net.apply({"params": params}, latents, embeddings, transcribe,
                             method="decode")
        return _nhwc_to_nchw(out)

    # Number of 50%-overlapped chunks processed per device step during
    # streaming inference. 4 measured best on v5e (per-chunk cost drops
    # ~2x vs sequential; batch 8 regresses from memory pressure).
    chunk_group = 4

    def _chunked_fn(self, params, audio, transcribe):
        """Streaming 50%-overlap Hann overlap-add, grouped for TPU utilization.

        ``audio`` is already padded to a block multiple AND extended by half
        a block on each side (see chunked_inference). Chunks are processed
        ``chunk_group`` at a time inside a ``lax.scan`` (better MXU/VPU
        occupancy than one chunk per step), then the overlap-add is done
        vectorized: even chunks tile frames contiguously, odd chunks tile at
        a half-window offset, so the whole accumulation is two reshapes and
        two static slice-adds.
        """
        L = self.sliCQ.block_length
        M = self.sliCQ.max_window_length
        F = self.sliCQ.n_bins
        B = audio.shape[0]
        C = self.net.in_channels
        hop = L // 2
        n_chunks = (audio.shape[-1] - hop) // hop
        n_frames = self.sliCQ.get_expected_frames(audio.shape[-1])
        window = jnp.asarray(np.hanning(M), jnp.float32)

        G = max(1, min(self.chunk_group, n_chunks))
        n_groups = -(-n_chunks // G)
        # Extend audio so every group can slice G full chunks.
        needed = ((n_groups * G - 1) * hop + L) - audio.shape[-1]
        if needed > 0:
            audio = jnp.pad(audio, [(0, 0), (0, 0), (0, needed)])

        def body(_, g):
            def one(i):
                return jax.lax.dynamic_slice(
                    audio, (0, 0, (g * G + i) * hop), (B, 1, L))

            chunks = jnp.stack([one(i) for i in range(G)])  # (G,B,1,L)
            out = self._infer_fn(params, chunks.reshape(G * B, 1, L),
                                 transcribe)
            return None, out.reshape(G, B, C, F, M)

        _, outs = jax.lax.scan(body, None, jnp.arange(n_groups))
        outs = outs.reshape(n_groups * G, B, C, F, M)[:n_chunks]
        outs = outs * window

        even = outs[0::2]  # frame offsets 0, M, 2M, ...
        odd = outs[1::2]   # frame offsets M/2, 3M/2, ...
        acc = jnp.zeros((B, C, F, n_frames + 2 * M), jnp.float32)
        even_flat = jnp.moveaxis(even, 0, -2).reshape(B, C, F, -1)
        acc = acc.at[..., :even_flat.shape[-1]].add(even_flat)
        if odd.shape[0]:
            odd_flat = jnp.moveaxis(odd, 0, -2).reshape(B, C, F, -1)
            acc = acc.at[..., M // 2: M // 2 + odd_flat.shape[-1]].add(odd_flat)
        # Trim the centering margins (reference modules.py:266-267).
        return acc[..., M // 2: n_frames - M // 2]

    # ------------------------------------------------------------------ #
    # Public API (reference layouts)                                     #
    # ------------------------------------------------------------------ #

    def encode(self, audio):
        """Audio (B,1,N) -> (latents (B,D,T), embeddings NHWC list, losses)."""
        latents, embeddings, losses = self._encode_jit(self.params, jnp.asarray(audio))
        return jnp.swapaxes(latents, -1, -2), embeddings, losses

    def apply_skip_connections(self, embeddings):
        return self.net.apply({"params": self.params}, embeddings,
                              method="apply_skip_connections")

    def decode(self, latents, embeddings=None, transcribe=False):
        """Latents (B,D,T) -> coefficients (B,C,F,T)."""
        internal = jnp.swapaxes(jnp.asarray(latents), -1, -2)
        out = self._decode_jit(self.params, internal, embeddings, bool(transcribe))
        return _nhwc_to_nchw(out)

    def forward(self, audio, consistency=False):
        """Training-mode forward (reference modules.py:338-393).

        Returns (reconstruction, latents, transcription, transcription_rec,
        transcription_scr, losses) in reference layouts.
        """
        rec, latents, trn, trn_rec, trn_scr, losses = self._forward_jit(
            self.params, jnp.asarray(audio), bool(consistency))
        cvt = _nhwc_to_nchw
        return (cvt(rec), jnp.swapaxes(latents, -1, -2), cvt(trn),
                None if trn_rec is None else cvt(trn_rec),
                None if trn_scr is None else cvt(trn_scr), losses)

    __call__ = forward

    def inference(self, audio, transcribe=False):
        """Full-length single pass (reference modules.py:179-202)."""
        audio = self.sliCQ.pad_to_block_length(jnp.asarray(audio))
        return self._infer_jit(self.params, audio, bool(transcribe))

    def chunked_inference(self, audio, transcribe=False):
        """Arbitrary-length streaming inference (reference modules.py:204-269)."""
        audio = self.sliCQ.pad_to_block_length(jnp.asarray(audio))
        hop = self.sliCQ.block_length // 2
        audio = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(hop, hop)])
        return self._chunked_jit(self.params, audio, bool(transcribe))

    def _pad_for_chunks(self, audio):
        """Block-multiple + half-block centering pads (static shapes)."""
        audio = self.sliCQ.pad_to_block_length(jnp.asarray(audio))
        hop = self.sliCQ.block_length // 2
        return jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(hop, hop)])

    def _transcribe_fn(self, params, audio):
        """Fused pad -> chunked inference -> activations (one program).

        Keeping the whole pipeline in one jit removes ~30% of wall time vs
        eager pads + a separate activation pass on large outputs.
        """
        with self._analysis_ctx():
            coefficients = self._chunked_fn(
                params, self._pad_for_chunks(audio), True)
            return self.to_activations(coefficients)

    def _reconstruct_fn(self, params, audio):
        """Fused pad -> chunked inference -> inverse sliCQ -> normalize."""
        coefficients = self._chunked_fn(params, self._pad_for_chunks(audio),
                                        False)
        return self.sliCQ._decode_real(coefficients)

    def to_activations(self, coefficients):
        """Transcription coefficients (B,C,F,T) -> activations (B,F,T) in [0,1]."""
        return jnp.tanh(CQT.to_magnitude(coefficients))

    def to_activations_nhwc(self, coefficients):
        """Internal-layout (B,F,T,C) counterpart used by the training step."""
        return jnp.tanh(jnp.linalg.norm(coefficients, axis=-1))

    # Streaming-transcribe piece size, in sliCQ blocks. Pieces pipeline the
    # host->device upload against device compute: all transfers are enqueued
    # up front and each piece's scan starts as soon as its data lands, so
    # wall time ~ max(total upload, total compute) instead of their sum.
    piece_blocks = 16

    # Route host clips SHORTER than the streaming threshold through the
    # one-piece program too (zero-pad to a piece, trim the frames): every
    # distinct clip length otherwise compiles its own program, and under
    # the fused single-kernel inference path a new program costs minutes
    # of Mosaic compile (docs/PERFORMANCE.md "whole-stack fusion") — fatal
    # for corpus evaluation over varied-length tracks. The padded compute
    # is nearly free at >1000x realtime on TPU; on the CPU/flax path it
    # is NOT (16x a short clip's work), so None -> auto: piece-pad only
    # when the fused TPU path is active.
    pad_short_to_piece = None

    def _analysis_ctx(self):
        """FFT precision for transcription analysis (trace-time context).

        The exact (HIGHEST) transform is required for reconstruction and
        training targets; transcription activations (tanh of magnitudes,
        then peak-picked) are insensitive, so the fused fast path also runs
        the analysis DFT matmuls at the TPU-native bf16 rate.
        """
        from ..ops.fft import fft_precision

        if self._use_fused() and self.fused != "f32":
            return fft_precision("default")
        import contextlib

        return contextlib.nullcontext()

    def _piece_fn(self, params, segment):
        """Chunk-scan + activations over one pre-extended audio piece.

        ``segment`` is ``piece_blocks*L + L`` samples: the piece plus a
        half-block halo on each side (the 50%-overlap context), i.e. exactly
        the ``_pad_for_chunks`` form of a piece — ``_chunked_fn`` then
        yields precisely the piece's frames.
        """
        with self._analysis_ctx():
            return self.to_activations(
                self._chunked_fn(params, segment, True))

    def _seg_f32_fn(self, segment):
        """Audio segment of any ingestion dtype -> f32 (device-side).

        Same semantics as features_from_audio's dtype handling (PCM16
        dequantizes by 1/32768; f16 casts): running it as its own tiny
        program keeps the expensive piece program dtype-invariant.
        """
        segment = jnp.asarray(segment)
        if segment.dtype == jnp.int16:
            return segment.astype(jnp.float32) * (1.0 / 32768.0)
        return segment.astype(jnp.float32)

    def _piece_recon_fn(self, params, segment):
        """Chunk-scan + UNNORMALIZED synthesis over one audio piece.

        sliCQ synthesis is strictly per-block (transform/nsgt.py:decode
        reshapes to (nb, M) frames and runs an independent irfft per
        block), so decoding pieces and concatenating equals decoding the
        whole coefficient tensor; only the reference's global infinity-norm
        normalization (cqtwrapper.py:209-211) must wait for the full
        signal — reconstruct() applies it after concatenation.
        """
        coefficients = self._chunked_fn(params, segment, False)
        cplx = CQT.to_complex(coefficients)[:, None]
        return self.sliCQ.decode_raw(jax.lax.stop_gradient(cplx))

    def _stream_pieces(self, audio_np, piece_jit, out_per_block):
        """Upload-pipelined piece execution over a host array.

        Pads/edges each ``piece_blocks*L + L`` window (zero halo at both
        signal edges), overlaps each piece's host->device transfer with the
        previous piece's compute, concatenates on device, and trims to
        ``n_blocks * out_per_block`` output columns.
        """
        from concurrent.futures import ThreadPoolExecutor

        L = self.sliCQ.block_length
        hop = L // 2
        P = self.piece_blocks
        n_blocks = -(-audio_np.shape[-1] // L)
        n_pieces = -(-n_blocks // P)
        seg_len = P * L + L
        lead = [(0, 0)] * (audio_np.ndim - 1)

        def piece(i):
            # Window [i*P*L - hop, (i+1)*P*L + hop) of the audio;
            # interior pieces are pure views (no 53 MB np.pad copy).
            a = i * P * L - hop
            b = a + seg_len
            lo, hi = max(a, 0), min(b, audio_np.shape[-1])
            seg = audio_np[..., lo:hi]
            if lo > a or hi < b:
                seg = np.pad(seg, lead + [(lo - a, b - hi)])
            return seg

        # One upload worker keeps transfers streaming back-to-back while
        # the main thread dispatches each piece's compute as soon as its
        # data lands — wall time ~ max(upload, compute). int16/f16
        # segments upload at half the bytes and are converted to f32 by a
        # trivial per-dtype program BEFORE the piece program, so every
        # input dtype shares the ONE compiled piece program (a fused-
        # kernel program costs minutes of Mosaic compile per variant).
        with ThreadPoolExecutor(1) as pool:
            futs = [pool.submit(jax.device_put, piece(i))
                    for i in range(n_pieces)]
            outs = [piece_jit(self.params, self._seg_f32_jit(f.result()))
                    for f in futs]
        out = jnp.concatenate(outs, axis=-1)
        return out[..., :n_blocks * out_per_block]

    def _piece_route(self, audio_np):
        """Whether a host input should ride the fixed-shape piece programs."""
        L = self.sliCQ.block_length
        n_blocks = -(-audio_np.shape[-1] // L)
        if n_blocks >= 2 * self.piece_blocks:
            return True
        if self.pad_short_to_piece is not None:
            return self.pad_short_to_piece
        return self._use_fused()

    def transcribe(self, audio):
        """Audio (B,1,N) -> multi-pitch activations (B,F,T).

        Host (numpy) inputs longer than a few pieces stream: uploads are
        pipelined against compute piece-by-piece (the tunnel/host link is
        the end-to-end bottleneck once the conv stack is fused). Short host
        clips zero-pad into the SAME one-piece program when the fused TPU
        path is active (pad_short_to_piece) — one compiled shape serves
        every host clip length. Device inputs take the full-length program.
        """
        if not isinstance(audio, jax.Array):
            audio_np = np.asarray(audio)
            # int16 (PCM16) and float16 inputs upload at half the f32
            # bytes and dequantize/cast on device (features_from_audio);
            # the tunnel/host link is the end-to-end bottleneck, so half
            # the bytes is ~2x the upload-bound throughput.
            if audio_np.dtype not in (np.int16, np.float16):
                audio_np = audio_np.astype(np.float32, copy=False)
            if self._piece_route(audio_np):
                return self._stream_pieces(audio_np, self._piece_jit,
                                           self.sliCQ.max_window_length)
        return self._transcribe_jit(self.params, jnp.asarray(audio))

    def reconstruct(self, audio_in):
        """Audio (B,1,N) -> resynthesized audio (B,1,N').

        Host inputs take the same fixed-shape piece streaming as
        transcribe (sliCQ synthesis is per-block, so piece-wise decode is
        exact); the reference's global infinity-norm normalization is
        applied after concatenation so it matches the one-program path.
        """
        if not isinstance(audio_in, jax.Array):
            audio_np = np.asarray(audio_in)
            if audio_np.dtype not in (np.int16, np.float16):
                audio_np = audio_np.astype(np.float32, copy=False)
            if self._piece_route(audio_np):
                out = self._stream_pieces(audio_np, self._piece_recon_jit,
                                          self.sliCQ.block_length)
                peak = jnp.max(jnp.abs(out))
                return jnp.where(peak > 0, out / peak, out)
        return self._reconstruct_jit(self.params, jnp.asarray(audio_in))

    # ------------------------------------------------------------------ #
    # Persistence (torch.save/torch.load-style UX over orbax)            #
    # ------------------------------------------------------------------ #

    def save(self, path):
        """Save hyperparameters + weights under a directory."""
        import json
        import os

        from ..train.checkpoint import save_checkpoint

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "hparams.json"), "w") as fh:
            json.dump(self.hparams, fh, indent=2)
        save_checkpoint(os.path.join(path, "weights"), self.params)
        return path

    @staticmethod
    def load(path, seed=0):
        """Rebuild a saved model (any variant) from :meth:`save` output."""
        import json
        import os

        from ..train.checkpoint import load_checkpoint

        with open(os.path.join(path, "hparams.json")) as fh:
            hparams = json.load(fh)
        variant = hparams.pop("variant", "base")
        cls = {"base": TimbreTrap, "film": TimbreTrapFiLM,
               "mag": TimbreTrapMag, "magdb": TimbreTrapMagDB}[variant]
        model = cls(seed=seed, **hparams)
        model.params = load_checkpoint(os.path.join(path, "weights"))["params"]
        return model


class TimbreTrapFiLM(TimbreTrap):
    """FiLM-conditioned decoder switch (reference modules.py:780-839)."""

    variant = "film"


class TimbreTrapMag(TimbreTrap):
    """Magnitude-CQT (amplitude) variant (reference modules.py:892-992)."""

    variant = "mag"

    def _features_from_complex(self, coefficients):
        real = CQT.to_real(coefficients)
        mag = CQT.to_magnitude(real)  # (B,F,T)
        return mag[..., None]  # NHWC with C=1

    def to_activations(self, coefficients):
        return jnp.tanh(jnp.squeeze(coefficients, axis=-3))

    def to_activations_nhwc(self, coefficients):
        return jnp.tanh(coefficients[..., 0])


class TimbreTrapMagDB(TimbreTrapMag):
    """Magnitude-CQT (rescaled decibels) variant (reference modules.py:995-1075)."""

    variant = "magdb"

    def _features_from_complex(self, coefficients):
        real = CQT.to_real(coefficients)
        mag = CQT.to_magnitude(real)
        db = CQT.to_decibels(mag)
        return db[..., None]

    def to_activations(self, coefficients):
        return jnp.squeeze(coefficients, axis=-3)

    def to_activations_nhwc(self, coefficients):
        return coefficients[..., 0]


def load_model(path, seed=0, overrides=None, defaults=None):
    """Rebuild a trained model of ANY configuration from a checkpoint path.

    Accepts every checkpoint layout the framework produces (VERDICT r4 #5 —
    the reference sidesteps this by pickling whole modules,
    ``train.py:506-511``; here configuration travels as ``hparams.json``):

    * a ``model.save`` directory (``hparams.json`` + ``weights/``),
    * a Trainer step checkpoint ``<run>/models/model-N`` whose run directory
      carries the ``hparams.json`` the Trainer writes at the first
      checkpoint (train/loop.py), or a sibling ``model-N.hparams.json``,
    * a bare param-tree checkpoint (pre-r5 runs): ``defaults`` must then
      supply the constructor arguments.

    ``overrides``: constructor arguments that take precedence over stored
    hparams (e.g. ``transform_compat``, ``compat_tables``, ``fused``,
    or an explicit ``variant``/``skip_connections`` for legacy
    checkpoints). ``defaults``: arguments used only where the checkpoint
    carries no hparams. Returns the model with params loaded.
    """
    import json
    import os

    from ..train.checkpoint import load_params

    path = os.path.normpath(path)
    hparams, weights = None, path
    if os.path.isfile(os.path.join(path, "hparams.json")):
        with open(os.path.join(path, "hparams.json")) as fh:
            hparams = json.load(fh)
        if os.path.isdir(os.path.join(path, "weights")):
            weights = os.path.join(path, "weights")
    elif os.path.isfile(path + ".hparams.json"):
        with open(path + ".hparams.json") as fh:
            hparams = json.load(fh)
    elif os.path.isfile(os.path.join(os.path.dirname(path), "hparams.json")):
        with open(os.path.join(os.path.dirname(path), "hparams.json")) as fh:
            hparams = json.load(fh)

    merged = dict(defaults or {}) if hparams is None else dict(hparams)
    merged.update({k: v for k, v in (overrides or {}).items()
                   if v is not None})
    if not merged:
        raise ValueError(
            f"{path} carries no hparams.json and no defaults were given")
    variant = merged.pop("variant", "base")
    cls = {"base": TimbreTrap, "film": TimbreTrapFiLM,
           "mag": TimbreTrapMag, "magdb": TimbreTrapMagDB}[variant]
    model = cls(seed=seed, **merged)
    model.params = load_params(weights)
    return model
