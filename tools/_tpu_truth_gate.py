import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap

def log(*a): print(*a, flush=True)

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
sr = 22050
t = np.arange(3 * sr) / sr
audio = sum(0.3*np.sin(2*np.pi*f*t) for f in (220., 330., 440.))
audio = jnp.asarray(audio[None, None, :], jnp.float32)
pad = m.sliCQ.pad_to_block_length(audio)

cpu = jax.local_devices(backend="cpu")[0]
m.fused = "off"  # flax path for the CPU truth computation
with jax.default_matmul_precision("highest"):
    truth = jax.jit(lambda p, a: m._infer_fn(p, a, False), device=cpu)(
        jax.device_put(m.params, cpu), jax.device_put(pad, cpu))
truth = np.asarray(truth)
log("truth computed on cpu", truth.shape)

outs = {}
for mode in ("off", "auto"):
    m.fused = mode
    coeffs = m._infer_jit(m.params, pad, False)
    # compare on device vs uploaded truth
    tr = jax.device_put(jnp.asarray(truth))
    d = coeffs - tr
    snr = 10*np.log10(float(jnp.sum(tr**2)) / max(float(jnp.sum(d**2)),1e-20))
    log(f"{mode}: SNR vs cpu-f32 truth = {snr:.1f} dB")
    outs[mode] = coeffs
d = outs["auto"] - outs["off"]
snr = 10*np.log10(float(jnp.sum(outs["off"]**2)) / max(float(jnp.sum(d**2)),1e-20))
log(f"fused-vs-flax agreement: {snr:.1f} dB")
