import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.eval import quality_f1

m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
t0 = time.time()
f1 = quality_f1(m, n_tracks=8, steps=120, lr=2e-3, seed=0, batch_size=4,
                conv_backend="pallas")
print(f"packed training mpe_f1={f1:.5f} ({time.time()-t0:.0f}s)", flush=True)
