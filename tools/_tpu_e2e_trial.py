import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap

sr, seconds = 22050, 600.0
rng = np.random.default_rng(0)
t = np.arange(int(seconds * sr)) / sr
audio = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
audio = (audio + 0.01 * rng.standard_normal(t.shape))[None, None, :].astype(np.float32)

def run(model, label):
    aud = jax.device_put(jnp.asarray(audio))
    float(jnp.sum(aud))
    t0 = time.time()
    acts = model.transcribe(aud); s = float(jnp.sum(acts))
    print(f"{label}: compile+run {time.time()-t0:.1f}s sum={s:.3f}")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(jnp.sum(model.transcribe(aud))); ts.append(time.perf_counter()-t0)
    rtf = seconds/min(ts)
    print(f"{label}: device RTF {rtf:.0f}x  ({min(ts)*1000:.0f} ms)")
    return np.asarray(jax.device_get(acts[:, :, ::97]))  # sparse sample (slow d2h)

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
m.fused = "off"
a_off = run(m, "flax ")
m2 = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                secs_per_block=3, latent_size=128, model_complexity=2)
m2.params = m.params
a_on = run(m2, "fused")
d = np.abs(a_on - a_off)
print("activation maxdiff:", d.max(), "mean:", d.mean())
