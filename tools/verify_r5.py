"""Round-5 real-chip verification + batch_pairs A/B (VERDICT r4 #2).

Drives the library surface on the real TPU:
  1. transform round trip (SNR > 60 dB invariant),
  2. reference-recipe train step (pallas_bf16) with the stacked 2B decoder
     sweeps ON vs OFF — wall ms/step and first-step loss parity,
  3. model.transcribe on a synthetic chord (shape + range).

Usage: python tools/verify_r5.py
"""

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(600, repeat=True)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.transform import CQT
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    log("devices:", jax.devices())

    # 1. transform round trip
    cqt = CQT(n_octaves=9, bins_per_octave=60, sample_rate=22050,
              secs_per_block=3)
    a = np.random.default_rng(0).standard_normal(
        (1, 1, cqt.block_length)).astype(np.float32)
    r = jax.jit(lambda x: cqt.decode_raw(cqt.encode_raw(x)))(jnp.asarray(a))
    aj = jnp.asarray(a)
    snr = 10 * np.log10(float(jnp.sum(aj ** 2))
                        / float(jnp.sum((aj - r) ** 2)))
    log(f"round-trip SNR: {snr:.1f} dB")
    assert snr > 60.0

    # 2. train step A/B: batch_pairs on/off (pallas_bf16, reference recipe)
    from timbre_trap_tpu.models import fused as fused_mod
    from timbre_trap_tpu.train.measure import reference_recipe_step_time

    m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                   secs_per_block=3, latent_size=128, model_complexity=2)
    orig = fused_mod.packed_train_forward
    results = {}
    for mode in (True, False):
        def patched(*args, **kw):
            kw["batch_pairs"] = mode
            return orig(*args, **kw)

        fused_mod.packed_train_forward = patched
        t0 = time.time()
        best, loss = reference_recipe_step_time(m, "pallas_bf16")
        results[mode] = (best, loss)
        log(f"batch_pairs={mode}: step {best*1000:.1f} ms "
            f"({8*3*3/best:.1f} audio-s/s) loss={loss:.4f} "
            f"(total incl compile {time.time()-t0:.0f}s)")
    fused_mod.packed_train_forward = orig
    (t_on, l_on), (t_off, l_off) = results[True], results[False]
    log(f"A/B: stacked sweeps save {(t_off-t_on)*1000:.1f} ms/step "
        f"({100*(1-t_on/t_off):.1f}%); loss delta {abs(l_on-l_off):.2e}")

    # 3. transcribe sanity
    sr = 22050
    t = np.arange(6 * sr) / sr
    chord = sum(0.3 * np.sin(2 * np.pi * f * t)
                for f in (220.0, 277.2, 329.6))
    acts = m.transcribe(chord[None, None, :].astype(np.float32))
    mx, mn = float(jnp.max(acts)), float(jnp.min(acts))
    log(f"transcribe: shape {acts.shape}, range [{mn:.3f}, {mx:.3f}]")
    assert acts.shape[1] == 540 and 0.0 <= mn and mx <= 1.0
    log("VERIFY OK")


if __name__ == "__main__":
    main()
