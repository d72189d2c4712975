import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.models.fused import packed_train_forward
from timbre_trap_tpu.train import TrainConfig, init_train_state, make_train_step

def log(*a): print(*a, flush=True)
m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
B, L = 8, m.sliCQ.block_length * 3
M = m.sliCQ.get_expected_frames(L)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, 1, L)) * 0.1, jnp.float32)
gt = jnp.asarray((rng.uniform(size=(B, m.sliCQ.n_bins, M)) > 0.97), jnp.float32)

@jax.jit
def fwd_only(params, audio):
    feats = m.features_from_audio(audio)
    outs = packed_train_forward(params, m.net, feats, True)
    return sum(jnp.sum(o) for o in outs if o is not None)

t0 = time.time(); float(fwd_only(m.params, audio)); log(f"fwd compile {time.time()-t0:.0f}s")
ts = []
for _ in range(3):
    t0 = time.perf_counter(); float(fwd_only(m.params, audio)); ts.append(time.perf_counter()-t0)
log(f"packed fwd-only (consistency on): {min(ts)*1000:.0f} ms")

cfg = TrainConfig(multiplier_consistency=1.0)
step = jax.jit(make_train_step(m, cfg, mpe_batch_size=B, conv_backend="packed"))
params, opt = init_train_state(m, cfg)
t0 = time.time(); params, opt, met = step(params, opt, audio, gt, 1e-3); float(met["loss/total"])
log(f"step compile {time.time()-t0:.0f}s")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    params, opt, met = step(params, opt, audio, gt, 1e-3); float(met["loss/total"])
    ts.append(time.perf_counter()-t0)
log(f"packed full step: {min(ts)*1000:.0f} ms")
