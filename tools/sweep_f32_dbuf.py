"""Sweep f32 training tiles x input-DMA double-buffering (VERDICT r4 #7).

The f32 train backward has "no VMEM headroom at its widest safe tile"
(384), so r4 shipped it with SERIAL input DMAs — asserted, never swept: a
narrower tile frees slab VMEM that a second input buffer could use. This
tool measures the reference-recipe step (batch 8 x 9-s crops, consistency
on, conv_backend="pallas") for tile x dbuf combinations in ONE session.

Run on the real chip:  python tools/sweep_f32_dbuf.py
Findings land in docs/PERFORMANCE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.ops import fused_level
    from timbre_trap_tpu.train import (TrainConfig, init_train_state,
                                       make_train_step)
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    model = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                       secs_per_block=3, latent_size=128, model_complexity=2)
    cfg = TrainConfig(multiplier_consistency=1.0)
    batch, blocks = 8, 3
    L = model.sliCQ.block_length * blocks
    M = model.sliCQ.get_expected_frames(L)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, 1, L)) * 0.1, jnp.float32)
    gt = jnp.asarray(
        (rng.uniform(size=(batch, model.sliCQ.n_bins, M)) > 0.97),
        jnp.float32)

    orig_dbuf = fused_level._dbuf
    results = {}
    # (tile, dbuf): 384-serial is the shipped r4 config (the control);
    # 384-dbuf expected to OOM the backward stack (recorded if so).
    for tile, dbuf in ((384, False), (384, True), (256, True), (256, False),
                       (192, True)):
        fused_level._dbuf = (lambda d: True) if dbuf else (lambda d: False)
        key = f"tile{tile}-{'dbuf' if dbuf else 'serial'}"
        try:
            step = jax.jit(make_train_step(model, cfg, mpe_batch_size=batch,
                                           conv_backend="pallas",
                                           tile_t=tile))
            params, opt = init_train_state(model, cfg)
            params, opt, met = step(params, opt, audio, gt, 1e-3)
            loss = float(met["loss/total"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                params, opt, met = step(params, opt, audio, gt, 1e-3)
                float(met["loss/total"])
                best = min(best, time.perf_counter() - t0)
            results[key] = round(best * 1e3, 1)
            print(f"{key:16s} {best*1e3:7.1f} ms/step "
                  f"({batch*3*blocks/best:.1f} audio-s/s) loss={loss:.2f}",
                  flush=True)
        except Exception as exc:  # noqa: BLE001 — record OOMs as data
            results[key] = str(exc)[:120]
            print(f"{key:16s} FAILED: {str(exc)[:200]}", flush=True)
    fused_level._dbuf = orig_dbuf
    print(json.dumps(results))


if __name__ == "__main__":
    main()
