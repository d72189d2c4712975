"""Bisect the r3->r4 device_rtf move (1061.7 -> 992.2, BENCH_r0{3,4}.json).

Round 4's only inference-path change was commit f1e6332, which bundled TWO
separable edits that both execute inside the bf16 fused transcribe path:

  1. block builder: one-hot-einsum contraction of the flax kernel
     (ops/packed_conv._build_blocks) vs the old advanced-index gather;
  2. input DMA: 2-slot double-buffered streaming across grid steps
     (ops/fused_level._input_dma / _dbuf) vs serial start()+wait().

This tool measures device-resident transcribe RTF (bench.py's device_rtf
protocol: 600 s synthetic audio, min-of-3, scalar-reduction sync) for all
four builder x DMA combinations IN ONE SESSION, so the comparison is free of
day-to-day environment drift. Run on the real chip:

    python tools/bisect_device_rtf.py

Findings land in docs/PERFORMANCE.md ("device_rtf bisect").
"""

import json
import time

import numpy as np


def _old_gather_build_blocks(kernel_fc, bias, f_in, f_out, c_in, c_out,
                             f_taps, dts):
    """Round-3 builder (git 3045094:ops/packed_conv.py): gather formulation."""
    import math

    import jax.numpy as jnp

    from timbre_trap_tpu.ops.packed_conv import BLOCK_ROWS, ConvBlocks

    n_f_per_block = BLOCK_ROWS // c_out
    assert BLOCK_ROWS % c_out == 0
    n_df = kernel_fc.shape[0]

    def window(block):
        offs = [f_taps(block * n_f_per_block + fl, df)
                for fl in range(n_f_per_block) for df in range(n_df)]
        return [o for o in offs if o is not None]

    w0, w1 = window(0), window(1)
    lo, hi = min(w0), max(w0)
    margin_rows = -lo * c_in
    col_adv = (min(w1) - lo) * c_in
    assert (max(w1) - min(w1)) == (hi - lo)
    shift = (-margin_rows) % 8
    margin_rows += shift
    k = (hi - lo + 1) * c_in + shift

    n_dt = len(dts)
    idx = np.zeros((4, n_dt, BLOCK_ROWS, k), np.int32)
    valid = np.zeros((n_dt, BLOCK_ROWS, k), bool)
    for di in range(n_dt):
        for fl in range(n_f_per_block):
            for co in range(c_out):
                r = fl * c_out + co
                for df in range(n_df):
                    off = f_taps(fl, df)
                    if off is None:
                        continue
                    base = (off - lo) * c_in + shift
                    for ci in range(c_in):
                        idx[:, di, r, base + ci] = (df, di, ci, co)
                        valid[di, r, base + ci] = True

    kern = jnp.asarray(kernel_fc)
    blocks = jnp.where(jnp.asarray(valid), kern[tuple(jnp.asarray(idx))], 0.0)
    bias = jnp.asarray(bias)
    bias_pat = jnp.tile(bias, n_f_per_block)
    return ConvBlocks(blocks, dts, bias_pat, col_adv, margin_rows,
                      f_in, f_out, c_in, c_out)


def _time(fn, iters=3):
    fn()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax.numpy as jnp

    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.ops import fused_level, packed_conv
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    sr = 22050
    seconds = 600.0
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    audio = sum(0.2 * np.sin(2 * np.pi * f * t) for f in (220.0, 277.2, 329.6))
    audio = (audio + 0.01 * rng.standard_normal(t.shape))[None, None, :]
    audio = audio.astype(np.float32)

    import jax

    audio_dev = jax.device_put(jnp.asarray(audio))
    float(jnp.sum(audio_dev))

    new_builder = packed_conv._build_blocks
    new_dbuf = fused_level._dbuf

    results = {}
    for builder_name, builder in (("einsum", new_builder),
                                  ("gather", _old_gather_build_blocks)):
        for dma_name, dbuf in (("dbuf", new_dbuf),
                               ("serial", lambda dtype: False)):
            packed_conv._build_blocks = builder
            fused_level._dbuf = dbuf
            # Fresh model instance -> fresh jit wrappers -> fresh trace.
            model = TimbreTrap(sample_rate=sr, n_octaves=9,
                               bins_per_octave=60, secs_per_block=3,
                               latent_size=128, model_complexity=2)
            elapsed = _time(
                lambda: float(jnp.sum(model.transcribe(audio_dev))))
            rtf = seconds / elapsed
            key = f"{builder_name}+{dma_name}"
            results[key] = round(rtf, 1)
            print(f"{key:16s} device_rtf = {rtf:8.1f}", flush=True)

    packed_conv._build_blocks = new_builder
    fused_level._dbuf = new_dbuf
    print(json.dumps(results))


if __name__ == "__main__":
    main()
