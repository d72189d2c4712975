"""Headline benchmark: transcribe() real-time factor on one TPU chip.

Prints ONE JSON line:
    {"metric": "transcribe_rtf", "value": N, "unit": "audio-sec/sec/chip",
     "vs_baseline": N}

``vs_baseline`` is value / 1.0 — i.e., the multiple of real-time. The
reference repo publishes no benchmark numbers (BASELINE.md); the north-star
from BASELINE.json is >= 5x an A100 real-time factor on transcribe(), so the
tracked unit is seconds of audio transcribed per wall-clock second per chip
with the flagship (released-model) configuration.
"""

import json
import sys
import time

import numpy as np


def main():
    from timbre_trap_tpu.models import TimbreTrap

    model = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                       secs_per_block=3, latent_size=128, model_complexity=2)
    sr = 22050
    seconds = 600.0  # 10 minutes: amortizes dispatch/upload; RTF is stable
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    audio = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
    audio = (audio + 0.01 * rng.standard_normal(t.shape))[None, None, :]
    audio = audio.astype(np.float32)

    import jax.numpy as jnp

    def run_once():
        acts = model.transcribe(audio)
        # NOTE: block_until_ready is not a reliable sync on the tunneled TPU
        # runtime; a scalar device reduction + host fetch forces execution.
        return float(jnp.sum(acts))

    run_once()  # warm-up / compile

    n_iters = 3
    start = time.perf_counter()
    for _ in range(n_iters):
        run_once()
    elapsed = (time.perf_counter() - start) / n_iters

    rtf = seconds / elapsed
    print(json.dumps({
        "metric": "transcribe_rtf",
        "value": round(rtf, 2),
        "unit": "audio-sec/sec/chip",
        "vs_baseline": round(rtf, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
