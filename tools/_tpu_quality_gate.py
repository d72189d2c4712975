import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.eval import quality_f1
from timbre_trap_tpu.eval.quality import synthesize_polyphony

def log(*a):
    print(*a, flush=True)

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)

# F1 with the fused (bf16 transcribe) path vs the flax path, same training.
for mode in ("off", "auto"):
    m.fused = mode
    t0 = time.time()
    f1 = quality_f1(m, n_tracks=8, steps=120, lr=2e-3, seed=0, batch_size=4)
    log(f"fused={mode}: mpe_f1={f1:.5f}  ({time.time()-t0:.0f}s)")

# Reconstruction SNR through the f32 fused path vs flax on a real signal.
sr = 22050
t = np.arange(6 * sr) / sr
audio = sum(0.3*np.sin(2*np.pi*f*t) for f in (220., 330., 440.))
audio = jnp.asarray(audio[None, None, :], jnp.float32)
outs = {}
for mode in ("off", "auto"):
    m.fused = mode
    r = m.reconstruct(audio)
    outs[mode] = r
    log(f"fused={mode}: reconstruct sum={float(jnp.sum(r)):.4f}")
d = outs["auto"] - outs["off"]
snr = 10*np.log10(float(jnp.sum(outs["off"]**2)) / max(float(jnp.sum(d**2)), 1e-20))
log(f"fused-vs-flax reconstruct agreement SNR: {snr:.1f} dB")
