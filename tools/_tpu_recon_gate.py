import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap

def log(*a): print(*a, flush=True)

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
sr = 22050
t = np.arange(6 * sr) / sr
audio = sum(0.3*np.sin(2*np.pi*f*t) for f in (220., 330., 440.))
audio = jnp.asarray(audio[None, None, :], jnp.float32)

# CPU ground truth (true f32) for the same infer, if a cpu backend exists.
truth = None
try:
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        feats = m._features_jit(audio)
        with jax.default_matmul_precision("highest"):
            truth_fn = jax.jit(lambda p, a: m._infer_fn(p, a, False), device=cpu)
    log("cpu backend available")
except Exception as e:
    log("no cpu backend:", type(e).__name__, e)

outs = {}
for mode in ("off", "auto"):
    m.fused = mode
    pad = m.sliCQ.pad_to_block_length(audio)
    coeffs = m._infer_jit(m.params, pad, False)
    outs[mode] = coeffs
    log(mode, "sum", float(jnp.sum(coeffs)))
d = outs["auto"] - outs["off"]
snr = 10*np.log10(float(jnp.sum(outs["off"]**2)) / max(float(jnp.sum(d**2)),1e-20))
log(f"infer(transcribe=False) fused-f32 vs flax agreement SNR: {snr:.1f} dB")

# reconstruct timing both modes (compile + 3 runs)
long_t = np.arange(int(120*sr))/sr
la = sum(0.2*np.sin(2*np.pi*f*long_t) for f in (220., 277.2, 329.6))
la = jax.device_put(jnp.asarray(la[None,None,:], jnp.float32)); float(jnp.sum(la))
for mode in ("off", "auto"):
    m.fused = mode
    float(jnp.sum(m.reconstruct(la)))
    ts=[]
    for _ in range(3):
        t0=time.perf_counter(); float(jnp.sum(m.reconstruct(la))); ts.append(time.perf_counter()-t0)
    log(f"reconstruct fused={mode}: RTF {120/min(ts):.0f}x")
