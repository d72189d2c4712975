import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.train import TrainConfig, init_train_state, make_train_step

def log(*a): print(*a, flush=True)

# Reference released-model recipe: batch 8, 9-s crops, consistency on
# (train.py:39-101). Single chip, remat boundaries.
m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
cfg = TrainConfig(multiplier_consistency=1.0)
B = 8
n_secs = 9
L = m.sliCQ.block_length * 3  # 9s = 3 blocks
M = m.sliCQ.get_expected_frames(L)
step = jax.jit(make_train_step(m, cfg, mpe_batch_size=B, conv_backend="pallas"))
params, opt = init_train_state(m, cfg)
rng = np.random.default_rng(0)
audio = jnp.asarray(rng.standard_normal((B, 1, L)) * 0.1, jnp.float32)
gt = jnp.asarray((rng.uniform(size=(B, m.sliCQ.n_bins, M)) > 0.97), jnp.float32)
t0 = time.time()
params, opt, metrics = step(params, opt, audio, gt, 1e-3)
loss = float(metrics["loss/total"])
log(f"compile+first step {time.time()-t0:.0f}s loss={loss:.3f}")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    params, opt, metrics = step(params, opt, audio, gt, 1e-3)
    float(metrics["loss/total"])
    ts.append(time.perf_counter() - t0)
log(f"batch {B} x {n_secs}s step: {min(ts)*1000:.0f} ms "
    f"({B*n_secs/min(ts):.1f} audio-s/s)")
