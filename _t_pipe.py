"""Instrument trainer-loop phases on the real TPU (pipeline overhead hunt)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from timbre_trap_tpu.data import DataLoader, constants
from timbre_trap_tpu.data.loader import device_prefetch
from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.train import (TRAIN_AUDIO_SCALE, TrainConfig,
                                   init_train_state, make_train_step)
from timbre_trap_tpu.utils import enable_persistent_compilation_cache

enable_persistent_compilation_cache()
m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
               secs_per_block=3, latent_size=128, model_complexity=2)
B, blocks, n_batches = 8, 3, 12
L = m.sliCQ.block_length * blocks
M = m.sliCQ.get_expected_frames(L)
F = m.sliCQ.n_bins


class SynthSet:
    def __len__(self):
        return B * n_batches

    def __getitem__(self, i):
        r = np.random.default_rng(i)
        return {constants.KEY_TRACK: str(i),
                constants.KEY_AUDIO: (r.standard_normal((1, L))
                                      .astype(np.float32) * 0.1),
                constants.KEY_GROUND_TRUTH: (r.uniform(size=(F, M)) > 0.97
                                             ).astype(np.float32)}


cfg = TrainConfig(multiplier_consistency=1.0)
step = jax.jit(make_train_step(m, cfg, mpe_batch_size=B,
                               conv_backend="pallas"))
params, opt = init_train_state(m, cfg)

loader = DataLoader(SynthSet(), batch_size=B, num_workers=2, seed=0)


def compose(data):
    audio = np.asarray(data[constants.KEY_AUDIO], np.float32)
    gt = np.asarray(data[constants.KEY_GROUND_TRUTH], np.float32)
    a16 = np.clip(np.rint(audio * TRAIN_AUDIO_SCALE), -32768,
                  32767).astype(np.int16)
    g8 = np.rint(np.clip(gt, 0.0, 1.0) * 255.0).astype(np.uint8)
    return a16, g8


def run_epoch(tag):
    t_next = t_put = t_disp = 0.0
    batches = device_prefetch((compose(d) for d in loader), depth=2)
    t_ep = time.perf_counter()
    nxt = next(batches, None)
    t0 = time.perf_counter()
    dev = (jax.device_put(nxt[0]), jax.device_put(nxt[1]))
    t_put += time.perf_counter() - t0
    global params, opt
    n = 0
    while dev is not None:
        audio, gt = dev
        t0 = time.perf_counter()
        params, opt, met = step(params, opt, audio, gt, jnp.float32(1e-3))
        t_disp += time.perf_counter() - t0
        n += 1
        t0 = time.perf_counter()
        nxt = next(batches, None)
        t_next += time.perf_counter() - t0
        if nxt is None:
            dev = None
        else:
            t0 = time.perf_counter()
            dev = (jax.device_put(nxt[0]), jax.device_put(nxt[1]))
            t_put += time.perf_counter() - t0
    float(jnp.sum(met["loss/total"]))
    wall = time.perf_counter() - t_ep
    print(f"{tag}: wall {wall/n*1000:.0f} ms/step | next {t_next/n*1000:.0f}"
          f" | device_put {t_put/n*1000:.0f} | dispatch {t_disp/n*1000:.0f}")


run_epoch("epoch1(compile)")
run_epoch("epoch2")
run_epoch("epoch3")
