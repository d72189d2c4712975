"""TPU performance / quality measurement suite (real-chip runs).

Consolidates the round-2 measurement harnesses. Run from the repo root on a
machine with the TPU attached:

    python tools/tpu_perf.py level     # fused level kernels vs flax, per level
    python tools/tpu_perf.py e2e       # transcribe RTF: streaming f32 + int16
    python tools/tpu_perf.py train     # reference-recipe step time per backend
    python tools/tpu_perf.py f1        # synthetic-polyphony training F1 per backend
    python tools/tpu_perf.py truth     # fidelity vs a true-fp32 CPU ground truth

All timings force execution with a scalar device reduction
(``float(jnp.sum(x))``) — ``block_until_ready`` is not a reliable sync on
tunneled runtimes — and scan benchmarks perturb inputs with the carry so
XLA cannot hoist the op out of the loop (docs/PERFORMANCE.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(*a):
    print(*a, flush=True)


def _flagship():
    from timbre_trap_tpu.models import TimbreTrap

    return TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                      secs_per_block=3, latent_size=128, model_complexity=2)


def _bench(fn, x, iters=30):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(x + carry)
            return jnp.ravel(out)[0].astype(jnp.float32) * 1e-30, None

        tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return tot

    float(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def cmd_level(_):
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models.modules import EncoderBlock
    from timbre_trap_tpu.ops.packed_conv import pack_nhwc, unpack_to_nhwc
    from timbre_trap_tpu.ops.fused_level import (encoder_level_spec,
                                                 fused_level_apply)

    rng = np.random.default_rng(0)
    B, T = 4, 1024
    log(f"{'level':>10} {'flax':>9} {'f32':>9} {'bf16':>9}")
    for C, F in [(4, 540), (8, 269), (16, 133), (32, 65)]:
        x = jnp.asarray(rng.standard_normal((B, F, T, C)), jnp.float32)
        mod = EncoderBlock(out_channels=2 * C)
        params = mod.init(jax.random.PRNGKey(1), x)["params"]
        spec = encoder_level_spec(params, F)
        xp = pack_nhwc(x)
        tf = _bench(lambda x: mod.apply({"params": params}, x), x)
        t32 = _bench(lambda xp: fused_level_apply(xp, spec,
                                                  dtype=jnp.float32), xp)
        t16 = _bench(lambda xp: fused_level_apply(xp, spec,
                                                  dtype=jnp.bfloat16), xp)
        log(f"{f'C={C}':>10} {tf*1e6:>7.0f}us {t32*1e6:>7.0f}us "
            f"{t16*1e6:>7.0f}us")


def cmd_e2e(_):
    import jax.numpy as jnp

    sr, seconds = 22050, 600.0
    rng = np.random.default_rng(0)
    t = np.arange(int(seconds * sr)) / sr
    audio = sum(0.2 * np.sin(2 * np.pi * f * t)
                for f in (220.0, 277.2, 329.6))
    audio = ((audio + 0.01 * rng.standard_normal(t.shape))[None, None, :]
             .astype(np.float32))
    pcm = (audio * 32767 / np.abs(audio).max()).astype(np.int16)
    m = _flagship()
    for name, arr in (("f32-stream", audio), ("i16-stream", pcm)):
        float(jnp.sum(m.transcribe(arr)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(m.transcribe(arr)))
            ts.append(time.perf_counter() - t0)
        log(f"{name}: e2e RTF {seconds/min(ts):.0f}x ({min(ts):.2f}s)")


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.train import (TrainConfig, init_train_state,
                                       make_train_step)
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    m = _flagship()
    cfg = TrainConfig(multiplier_consistency=1.0)
    B, blocks = 8, 3  # reference recipe: batch 8 x 9-s crops
    L = m.sliCQ.block_length * blocks
    M = m.sliCQ.get_expected_frames(L)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, 1, L)) * 0.1, jnp.float32)
    gt = jnp.asarray((rng.uniform(size=(B, m.sliCQ.n_bins, M)) > 0.97),
                     jnp.float32)
    for backend in args.backends.split(","):
        step = jax.jit(make_train_step(m, cfg, mpe_batch_size=B,
                                       conv_backend=backend))
        params, opt = init_train_state(m, cfg)
        t0 = time.time()
        params, opt, met = step(params, opt, audio, gt, 1e-3)
        loss = float(met["loss/total"])
        log(f"{backend}: compile+first {time.time()-t0:.0f}s loss={loss:.2f}")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt, met = step(params, opt, audio, gt, 1e-3)
            float(met["loss/total"])
            ts.append(time.perf_counter() - t0)
        log(f"{backend}: step {min(ts)*1000:.0f} ms "
            f"({B*blocks*3/min(ts):.1f} audio-s/s)")


def cmd_f1(args):
    from timbre_trap_tpu.eval import quality_f1
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    m = _flagship()
    for backend in args.backends.split(","):
        t0 = time.time()
        f1 = quality_f1(m, n_tracks=8, steps=120, lr=2e-3, seed=0,
                        batch_size=4, conv_backend=backend)
        log(f"{backend}: mpe_f1={f1:.5f} ({time.time()-t0:.0f}s)")


def cmd_truth(_):
    import jax
    import jax.numpy as jnp

    m = _flagship()
    sr = 22050
    t = np.arange(3 * sr) / sr
    audio = sum(0.3 * np.sin(2 * np.pi * f * t) for f in (220., 330., 440.))
    audio = jnp.asarray(audio[None, None, :], jnp.float32)
    pad = m.sliCQ.pad_to_block_length(audio)
    cpu = jax.local_devices(backend="cpu")[0]
    m.fused = "off"
    with jax.default_matmul_precision("highest"):
        truth = jax.jit(lambda p, a: m._infer_fn(p, a, False), device=cpu)(
            jax.device_put(m.params, cpu), jax.device_put(pad, cpu))
    truth = np.asarray(truth)
    for mode in ("off", "auto"):
        m.fused = mode
        coeffs = m._infer_jit(m.params, pad, False)
        tr = jax.device_put(jnp.asarray(truth))
        d = coeffs - tr
        snr = 10 * np.log10(float(jnp.sum(tr ** 2))
                            / max(float(jnp.sum(d ** 2)), 1e-20))
        log(f"fused={mode}: SNR vs cpu-f32 truth = {snr:.1f} dB")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("level")
    sub.add_parser("e2e")
    pt = sub.add_parser("train")
    pt.add_argument("--backends", default="pallas,packed")
    pf = sub.add_parser("f1")
    pf.add_argument("--backends", default="pallas")
    sub.add_parser("truth")
    args = p.parse_args()
    {"level": cmd_level, "e2e": cmd_e2e, "train": cmd_train,
     "f1": cmd_f1, "truth": cmd_truth}[args.cmd](args)


if __name__ == "__main__":
    main()
