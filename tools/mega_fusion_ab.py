"""A/B the r5 whole-stack inference fusion on the real chip.

`models/fused.FUSE_INFERENCE_LEVELS` routes the pallas inference path
through ONE whole-encoder and ONE whole-decoder kernel (fuse_level_specs)
instead of 4 per-level calls each — removing the HBM write+read of every
intermediate level boundary (~2.1k packed rows x T, bf16) and 6 of the 8
level-kernel dispatches per forward.

Measures bench.py's device_rtf protocol (600 s synthetic audio, device-
resident input, min-of-3, scalar-reduction sync) with the fusion ON vs
OFF in one session, plus an output-parity check between the two paths.
Also measures the f32 fused path (reconstruct protocol) both ways.

Run on the real chip:  python tools/mega_fusion_ab.py
Findings land in docs/PERFORMANCE.md ("whole-stack fusion").
"""

import json
import os
import sys
import time

import faulthandler

faulthandler.dump_traceback_later(900, repeat=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _time(fn, iters=3):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models import TimbreTrap, fused
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    sr = 22050
    seconds = 600.0
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    audio = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
    audio = (audio + 0.01 * rng.standard_normal(t.shape))[None, None, :]
    audio = audio.astype(np.float32)
    audio_dev = jax.device_put(jnp.asarray(audio))
    float(jnp.sum(audio_dev))

    # short clip for parity + the f32 reconstruct protocol. The parity
    # probe passes the HOST array: host clips ride the one-piece program
    # (models/timbre_trap.py pad_short_to_piece), so the expensive
    # full-kernel piece program is shared with bench.py's headline instead
    # of compiling a dedicated 60-s program per mode.
    short_np = audio[..., : int(60 * sr)]
    short = jax.device_put(jnp.asarray(short_np))
    float(jnp.sum(short))

    results = {}
    probes = {}
    for name, flag in (("full", "full"), ("stack", True),
                       ("per-level", False)):
        fused.FUSE_INFERENCE_LEVELS = flag
        model = TimbreTrap(sample_rate=sr, n_octaves=9, bins_per_octave=60,
                           secs_per_block=3, latent_size=128,
                           model_complexity=2)
        elapsed = _time(lambda: float(jnp.sum(model.transcribe(audio_dev))))
        results[f"device_rtf_{name}"] = round(seconds / elapsed, 1)
        print(f"{name:10s} device_rtf = {seconds / elapsed:8.1f}", flush=True)
        # f32 fused path (reconstruction protocol, HIGHEST precision)
        el32 = _time(lambda: float(jnp.sum(model.reconstruct(short))))
        results[f"recon_f32_rtf_{name}"] = round(60.0 / el32, 1)
        print(f"{name:10s} recon_f32_rtf = {60.0 / el32:8.1f}", flush=True)
        probes[name] = np.asarray(model.transcribe(short_np))

    fused.FUSE_INFERENCE_LEVELS = "full"
    for a, b in (("full", "per-level"), ("stack", "per-level")):
        d = float(np.max(np.abs(probes[a] - probes[b])))
        results[f"transcribe_delta_{a}"] = d
        print(f"parity: max |{a} - {b}| on transcribe = {d:.3e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
