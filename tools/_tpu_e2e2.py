import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap

def log(*a): print(*a, flush=True)
sr, seconds = 22050, 600.0
rng = np.random.default_rng(0)
t = np.arange(int(seconds * sr)) / sr
audio = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
audio = (audio + 0.01 * rng.standard_normal(t.shape))[None, None, :].astype(np.float32)
pcm = (audio * 32767 / np.abs(audio).max()).astype(np.int16)

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
for name, arr in (("f32-stream", audio), ("i16-stream", pcm)):
    float(jnp.sum(m.transcribe(arr)))  # compile piece program (cached after first)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(m.transcribe(arr))); ts.append(time.perf_counter()-t0)
    log(f"{name}: e2e RTF {seconds/min(ts):.0f}x ({min(ts):.2f}s)")
