"""Real-chip verification of shape-stable inference entry points (r5).

Claims under test (docs/PERFORMANCE.md "whole-stack fusion"):
  1. ANY host-clip length transcribes through the ONE cached piece
     program — after the first call, a NEW length must run in seconds,
     not pay a fused-kernel Mosaic compile (minutes).
  2. Cross-length consistency: the first block of frames of a clip is
     identical whether transcribed alone or as the prefix of a longer
     clip (the piece machinery sees the same samples + halo).
  3. reconstruct() rides the same piece streaming (per-block sliCQ
     synthesis + deferred global infinity-norm): new lengths are fast
     after the first, outputs have the contract length n_blocks * L.

Usage: python tools/verify_shape_stable.py
"""

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(900, repeat=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    log("devices:", jax.devices())

    sr = 22050
    m = TimbreTrap(sample_rate=sr, n_octaves=9, bins_per_octave=60,
                   secs_per_block=3, latent_size=128, model_complexity=2)
    L, M = m.sliCQ.block_length, m.sliCQ.max_window_length

    def chord(secs, seed=0):
        t = np.arange(int(secs * sr)) / sr
        x = sum(0.3 * np.sin(2 * np.pi * f * t)
                for f in (220.0, 277.2, 329.6))
        x = x + 0.01 * np.random.default_rng(seed).standard_normal(t.shape)
        return x[None, None, :].astype(np.float32)

    # 1. shape stability: first call may hit the persistent cache (warm)
    # or compile once; every SUBSEQUENT length must be seconds.
    times = {}
    for secs in (6.0, 4.1, 9.7, 13.3):
        a = chord(secs)
        t0 = time.perf_counter()
        acts = m.transcribe(a)
        s = float(jnp.sum(acts))  # force execution (device reduction)
        times[secs] = time.perf_counter() - t0
        n_blocks = -(-a.shape[-1] // L)
        assert acts.shape == (1, 540, n_blocks * M), acts.shape
        mx = float(jnp.max(acts))
        assert 0.0 <= mx <= 1.0 and np.isfinite(s)
        log(f"transcribe {secs:5.1f}s: {times[secs]:6.2f}s wall, "
            f"shape {acts.shape}, max {mx:.3f}")
    later = [times[s] for s in (4.1, 9.7, 13.3)]
    assert max(later) < 60.0, (
        f"non-first lengths must not recompile the fused kernel: {times}")

    # 2. cross-length prefix consistency (first block of frames): the
    # same leading samples transcribed alone vs as the prefix of a longer
    # clip must agree (only the final blocks see different context).
    a6 = chord(6.0, seed=1)
    x = chord(9.7, seed=1)
    x[..., : a6.shape[-1]] = a6
    f_short = np.asarray(m.transcribe(a6))[..., :M]
    f_long = np.asarray(m.transcribe(x))[..., :M]
    d = float(np.max(np.abs(f_short - f_long)))
    log(f"prefix consistency (first {M} frames): max |delta| = {d:.3e}")
    assert d < 2e-2, d  # bf16 activation grade (docs/PERFORMANCE.md)

    # 3. reconstruct shape stability (f32 stack kernels; first call may
    # compile the piece-recon program once — minutes, not tens of minutes).
    rt = {}
    for secs in (6.0, 10.2):
        a = chord(secs)
        t0 = time.perf_counter()
        y = m.reconstruct(a)
        s = float(jnp.sum(y))
        rt[secs] = time.perf_counter() - t0
        n_blocks = -(-a.shape[-1] // L)
        assert y.shape == (1, 1, n_blocks * L), y.shape
        pk = float(jnp.max(jnp.abs(y)))
        assert np.isfinite(s) and pk <= 1.0 + 1e-5, pk
        log(f"reconstruct {secs:5.1f}s: {rt[secs]:6.2f}s wall, "
            f"shape {y.shape}, peak {pk:.3f}")
    assert rt[10.2] < 60.0, rt
    log("SHAPE-STABLE VERIFY OK")


if __name__ == "__main__":
    main()
