"""Multi-chip long-form inference: shard the chunk axis over the mesh.

The reference handles long audio with a sequential 50%-overlap chunk loop
(``timbre_trap/framework/modules.py:204-269``). Chunks are independent
except for the Hann overlap-add, so for hour-scale audio the chunk axis is
simply data-parallel: every device runs the autoencoder on its shard of
chunks and XLA inserts the (tiny) collectives needed to overlap-add across
shard boundaries (SURVEY.md §5.7 — "embarrassingly parallel except
overlap-add, which is a local halo exchange").
"""

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import batch_sharded, replicated

__all__ = ["make_sharded_chunked_inference"]


def make_sharded_chunked_inference(model, mesh, transcribe=True):
    """Build fn(params, audio (B,1,N)) -> coefficients (B,C,F,T), sharded.

    The returned callable pads the audio like ``chunked_inference``, frames
    it into overlapping chunks on the host (cheap memcpy), shards the chunk
    axis over ``mesh``, and runs one jitted program for inference +
    overlap-add. Works for any audio length; recompiles per chunk count.
    """
    L = model.sliCQ.block_length
    M = model.sliCQ.max_window_length
    F = model.sliCQ.n_bins
    C = model.net.in_channels
    hop = L // 2
    n_devices = int(np.prod(mesh.devices.shape))
    window = np.hanning(M).astype(np.float32)

    def _overlap_add(outs, n_frames):
        # outs: (n_chunks, B, C, F, M) — even/odd tiling overlap-add.
        B = outs.shape[1]
        outs = outs * jnp.asarray(window)
        even = outs[0::2]
        odd = outs[1::2]
        acc = jnp.zeros((B, C, F, n_frames + 2 * M), jnp.float32)
        even_flat = jnp.moveaxis(even, 0, -2).reshape(B, C, F, -1)
        acc = acc.at[..., :even_flat.shape[-1]].add(even_flat)
        if odd.shape[0]:
            odd_flat = jnp.moveaxis(odd, 0, -2).reshape(B, C, F, -1)
            acc = acc.at[..., M // 2: M // 2 + odd_flat.shape[-1]].add(odd_flat)
        return acc[..., M // 2: n_frames - M // 2]

    def _device_fn(params, chunks, n_chunks, n_frames):
        # chunks: (n_pad_chunks, B, 1, L) with the leading axis sharded.
        n_pad, B = chunks.shape[0], chunks.shape[1]
        flat = chunks.reshape(n_pad * B, 1, L)
        outs = model._infer_fn(params, flat, transcribe)
        outs = outs.reshape(n_pad, B, C, F, M)[:n_chunks]
        return _overlap_add(outs, n_frames)

    jitted = {}

    def run(params, audio):
        audio = np.asarray(audio, np.float32)
        B = audio.shape[0]
        pad = -audio.shape[-1] % L
        audio = np.pad(audio, [(0, 0), (0, 0), (hop, hop + pad)])
        n_chunks = (audio.shape[-1] - hop) // hop
        n_frames = model.sliCQ.get_expected_frames(audio.shape[-1])
        n_pad_chunks = -n_chunks % n_devices
        total = n_chunks + n_pad_chunks
        if (audio.shape[-1] - L) // hop + 1 < total:
            audio = np.pad(audio, [(0, 0), (0, 0),
                                   (0, (total - 1) * hop + L - audio.shape[-1])])

        # Host-side framing: (total, B, 1, L)
        starts = np.arange(total) * hop
        chunks = np.stack([audio[..., s:s + L] for s in starts], axis=0)

        key = (total, n_chunks, n_frames, B)
        if key not in jitted:
            jitted[key] = jax.jit(
                lambda p, c: _device_fn(p, c, n_chunks, n_frames),
                in_shardings=(replicated(mesh), batch_sharded(mesh)),
                out_shardings=replicated(mesh),
            )
        sharded_chunks = jax.device_put(chunks, batch_sharded(mesh))
        return jitted[key](params, sharded_chunks)

    return run
