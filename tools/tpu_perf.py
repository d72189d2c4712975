"""TPU performance / quality measurement suite (real-chip runs).

Consolidates the round-2 measurement harnesses. Run from the repo root on a
machine with the TPU attached:

    python tools/tpu_perf.py level     # fused level kernels vs flax, per level
    python tools/tpu_perf.py e2e       # transcribe RTF: streaming f32 + int16
    python tools/tpu_perf.py train     # reference-recipe step time per backend
    python tools/tpu_perf.py trainstep # per-phase breakdown of the train step
    python tools/tpu_perf.py f1        # synthetic-polyphony training F1 per backend
    python tools/tpu_perf.py truth     # fidelity vs a true-fp32 CPU ground truth

All timings force execution with a scalar device reduction
(``float(jnp.sum(x))``) — ``block_until_ready`` is not a reliable sync on
tunneled runtimes — and scan benchmarks perturb inputs with the carry so
XLA cannot hoist the op out of the loop (docs/PERFORMANCE.md).
"""

import argparse
import faulthandler
import os
import sys
import time

# The tunneled runtime occasionally hangs a dispatch forever (zero CPU,
# futex wait — .claude/skills/verify/SKILL.md); dump all stacks if any
# single study phase stalls >10 min so the hang site is attributable.
faulthandler.dump_traceback_later(600, repeat=True)

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


def cmd_phases(_):
    """Per-phase device-time breakdown of the streaming transcribe step
    (VERDICT r2 #8): analysis transform vs fused levels vs the full
    chunk-group step, at exactly the shapes `_chunked_fn` runs."""
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.models.fused import fused_forward
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    m = _flagship()
    G, B = m.chunk_group, 1
    L = m.sliCQ.block_length
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.standard_normal((G * B, 1, L)) * 0.1, jnp.float32)
    feats = jax.jit(m.features_from_audio)(chunk)
    float(jnp.sum(feats))

    t_feat = _bench(lambda x: m.features_from_audio(x), chunk)
    t_levels = _bench(
        lambda f: fused_forward(m.params, m.net, f, True,
                                dtype=jnp.bfloat16), feats)
    t_full = _bench(lambda x: m._infer_fn(m.params, x, True), chunk)

    # Whole streaming pipeline per group (includes overlap-add + slicing).
    seconds = 60.0
    audio = jnp.asarray(
        rng.standard_normal((1, 1, int(seconds * 22050))) * 0.1, jnp.float32)
    acts = m.transcribe(audio)
    float(jnp.sum(acts))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(m.transcribe(audio)))
        ts.append(time.perf_counter() - t0)
    full = min(ts)
    n_chunks = int(2 * seconds * 22050 // L)
    per_group = full / max(1, -(-n_chunks // G))
    audio_s_per_group = G * L / 2 / 22050
    log(f"group step shapes: G={G} B={B} L={L}")
    log(f"analysis transform : {t_feat*1e3:7.2f} ms/group "
        f"({100*t_feat/t_full:4.1f}% of infer)")
    log(f"fused levels+head  : {t_levels*1e3:7.2f} ms/group "
        f"({100*t_levels/t_full:4.1f}% of infer)")
    log(f"_infer_fn total    : {t_full*1e3:7.2f} ms/group")
    log(f"streamed transcribe: {per_group*1e3:7.2f} ms/group wall "
        f"({seconds/full:.0f}x RT; overlap-add+dispatch "
        f"{(per_group-t_full)*1e3:.2f} ms/group)")
    log(f"per-phase device RTF: analysis {audio_s_per_group/t_feat:.0f}x, "
        f"levels {audio_s_per_group/t_levels:.0f}x")


def cmd_train(args):
    from timbre_trap_tpu.train.measure import reference_recipe_step_time
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if getattr(args, "skip", False):
        from timbre_trap_tpu.models import TimbreTrap

        m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                       secs_per_block=3, latent_size=128, model_complexity=2,
                       skip_connections=True)
    else:
        m = _flagship()
    for backend in args.backends.split(","):
        t0 = time.time()
        best, loss, peak = reference_recipe_step_time(m, backend,
                                                      return_memory=True)
        log(f"{backend}: compile+first {time.time()-t0-3*best:.0f}s "
            f"loss={loss:.2f}")
        log(f"{backend}: step {best*1000:.0f} ms "
            f"({8*3*3/best:.1f} audio-s/s), "
            f"peak HBM {peak/2**30:.2f} GiB")


def cmd_trainstep(args):
    """Phase economics of the reference-recipe training step (VERDICT r3
    #3): dequantize / analysis transform / fused forward / backward(+dW) /
    gradient telemetry / optimizer, measured as a LADDER of cumulative
    jitted programs on identical inputs — the ~57 ms per-call dispatch
    constant cancels in the differences (docs/PERFORMANCE.md "phase
    economics" for the same technique on transcribe).

    Every program's outputs are consumed through per-leaf max-abs
    reductions (non-decomposable through dots — a plain sum would let XLA
    rewrite sum(dot) into cheaper factored reductions and elide work;
    see tools/kernel_bench.py bench_op)."""
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.train.step import (TRAIN_AUDIO_SCALE, TrainConfig,
                                            compact_audio,
                                            compact_ground_truth,
                                            grad_norm_telemetry,
                                            init_train_state, make_loss_fn,
                                            make_optimizer, make_train_step)
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    log("# building model + uploading recipe batch ...")
    m = _flagship()
    backend = args.backends.split(",")[0]
    B, blocks = 8, 3
    L = m.sliCQ.block_length * blocks
    M = m.sliCQ.get_expected_frames(L)
    F = m.sliCQ.n_bins
    rng = np.random.default_rng(0)
    audio = compact_audio(rng.standard_normal((B, 1, L)) * 0.1)
    gt = compact_ground_truth(
        (rng.uniform(size=(B, F, M)) > 0.97).astype(np.float32))
    audio, gt = jnp.asarray(audio), jnp.asarray(gt)

    cfg = TrainConfig(multiplier_consistency=1.0)
    loss_fn = make_loss_fn(m, cfg, B, conv_backend=backend)
    tx = make_optimizer(cfg)
    log("# initializing train state ...")
    params, opt = init_train_state(m, cfg)

    def dequant(a, g):
        return (a.astype(jnp.float32) * (1.0 / TRAIN_AUDIO_SCALE),
                g.astype(jnp.float32) * (1.0 / 255.0))

    def consume(tree):
        return sum(jnp.max(jnp.abs(leaf)).astype(jnp.float32)
                   for leaf in jax.tree.leaves(tree))

    @jax.jit
    def prog_dq(a, g):
        return consume(dequant(a, g))

    @jax.jit
    def prog_feat(a, g):
        a, g = dequant(a, g)
        return consume(m.features_from_audio(a)) + consume(g)

    @jax.jit
    def prog_fwd(p, a, g):
        a, g = dequant(a, g)
        total, _ = loss_fn(p, m.features_from_audio(a), g)
        return total

    @jax.jit
    def prog_grad(p, a, g):
        a, g = dequant(a, g)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, m.features_from_audio(a), g)
        return total + consume(grads)

    @jax.jit
    def prog_tel(p, a, g):
        a, g = dequant(a, g)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, m.features_from_audio(a), g)
        return total + consume(grads) + consume(grad_norm_telemetry(grads))

    full_step = jax.jit(make_train_step(m, cfg, B, conv_backend=backend,
                                        compact_audio_grid=True))

    def timed(fn, *fargs, iters=5):
        float(jnp.sum(fn(*fargs)))  # compile + warm
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*fargs)))
            best = min(best, time.perf_counter() - t0)
        return best

    def timed_log(name, fn, *fargs):
        log(f"# compiling {name} ...")
        t0 = time.time()
        t = timed(fn, *fargs)
        log(f"# {name}: {t*1e3:.1f} ms (compile+measure {time.time()-t0:.0f}s)")
        return t

    t_disp = timed_log("dispatch", jax.jit(lambda x: x + 1.0),
                       jnp.float32(0.0))
    t_dq = timed_log("dequantize", prog_dq, audio, gt)
    t_feat = timed_log("+analysis", prog_feat, audio, gt)
    t_fwd = timed_log("+forward", prog_fwd, params, audio, gt)
    t_grad = timed_log("+backward", prog_grad, params, audio, gt)
    t_tel = timed_log("+telemetry", prog_tel, params, audio, gt)

    def timed_step(iters=5):
        p, o, met = full_step(params, opt, audio, gt, 1e-3)
        float(met["loss/total"])
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            p, o, met = full_step(p, o, audio, gt, 1e-3)
            float(met["loss/total"])
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = timed_step()

    log(f"backend={backend}  recipe: batch {B} x {blocks} blocks, "
        f"consistency on")
    log(f"{'ladder program':>28} {'wall':>9}")
    for name, t in [("dispatch floor", t_disp), ("dequantize", t_dq),
                    ("+ analysis transform", t_feat),
                    ("+ fused forward (loss)", t_fwd),
                    ("+ backward/dW (grads)", t_grad),
                    ("+ grad telemetry", t_tel),
                    ("full step (opt+update)", t_full)]:
        log(f"{name:>28} {t*1e3:>7.1f}ms")
    log("")
    log(f"{'derived phase':>28} {'time':>9} {'% of step':>10}")
    net = t_full - t_disp
    for name, t in [("dequantize", t_dq - t_disp),
                    ("analysis transform", t_feat - t_dq),
                    ("fused forward", t_fwd - t_feat),
                    ("backward + dW", t_grad - t_fwd),
                    ("grad telemetry", t_tel - t_grad),
                    ("optimizer + update", t_full - t_tel)]:
        log(f"{name:>28} {t*1e3:>7.1f}ms {100*t/net:>9.1f}%")
    log(f"{'TOTAL (step - dispatch)':>28} {net*1e3:>7.1f}ms")


def cmd_pipeline(args):
    """Steady-state Trainer step wall time with the loader active vs the
    bare device step — shows the host→device upload hides under compute
    via device_prefetch (train/loop.py; VERDICT r2 #5)."""
    import jax
    import jax.numpy as jnp

    from timbre_trap_tpu.data import DataLoader, constants
    from timbre_trap_tpu.train import (TrainConfig, Trainer, TrainerConfig,
                                       init_train_state, make_train_step)
    from timbre_trap_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    m = _flagship()
    B, blocks, n_batches = 8, 3, 12
    L = m.sliCQ.block_length * blocks
    M = m.sliCQ.get_expected_frames(L)
    F = m.sliCQ.n_bins
    rng = np.random.default_rng(0)

    class SynthSet:
        def __len__(self):
            return B * n_batches

        def __getitem__(self, i):
            r = np.random.default_rng(i)
            return {
                constants.KEY_TRACK: str(i),
                constants.KEY_AUDIO: (r.standard_normal((1, L))
                                      .astype(np.float32) * 0.1),
                constants.KEY_GROUND_TRUTH: (r.uniform(size=(F, M)) > 0.97
                                             ).astype(np.float32),
            }

    backend = args.backends.split(",")[0]

    # Bare device step (no loader): same measurement as `train`.
    cfg = TrainConfig(multiplier_consistency=1.0)
    step = jax.jit(make_train_step(m, cfg, mpe_batch_size=B,
                                   conv_backend=backend))
    params, opt = init_train_state(m, cfg)
    audio = jnp.asarray(rng.standard_normal((B, 1, L)) * 0.1, jnp.float32)
    gt = jnp.asarray((rng.uniform(size=(B, F, M)) > 0.97), jnp.float32)
    params, opt, met = step(params, opt, audio, gt, 1e-3)
    float(met["loss/total"])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt, met = step(params, opt, audio, gt, 1e-3)
        float(met["loss/total"])
        ts.append(time.perf_counter() - t0)
    bare = min(ts)
    log(f"bare device step: {bare*1000:.0f} ms")

    loader = DataLoader(SynthSet(), batch_size=B, num_workers=2, seed=0)
    tc = TrainerConfig(max_epochs=1, checkpoint_interval=10 ** 9,
                       batch_size=B, n_secs=blocks * 3.0,
                       conv_backend=backend, root_dir="/tmp/tpu_perf_run")
    trainer = Trainer(m, loader, None, [], tc)

    def drain():
        # run() dispatches asynchronously and never fetches (writer off) —
        # force the queued device work to finish so the epoch timing below
        # measures THIS epoch, not the previous one's backlog.
        float(jnp.sum(jax.tree.leaves(trainer.params)[0]))

    trainer.run()  # epoch 1: compiles, warms caches
    drain()
    trainer.batch_count = 0  # rewind so run() re-enters with warm step cache
    t0 = time.perf_counter()
    trainer.run()  # epoch 2: steady state
    drain()
    per_step = (time.perf_counter() - t0) / n_batches
    log(f"trainer step with loader active: {per_step*1000:.0f} ms "
        f"(overhead vs bare {100 * (per_step / bare - 1):.1f}%)")


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
    sub.add_parser("phases")
    pt = sub.add_parser("train")
    pt.add_argument("--backends", default="pallas,packed")
    pt.add_argument("--skip", action="store_true",
                    help="skip_connections=True flagship variant")
    pp = sub.add_parser("pipeline")
    pp.add_argument("--backends", default="pallas")
    ps = sub.add_parser("trainstep")
    ps.add_argument("--backends", default="pallas_bf16")
    pf = sub.add_parser("f1")
    pf.add_argument("--backends", default="pallas")
    sub.add_parser("truth")
    args = p.parse_args()
    {"level": cmd_level, "e2e": cmd_e2e, "phases": cmd_phases,
     "train": cmd_train, "trainstep": cmd_trainstep,
     "pipeline": cmd_pipeline, "f1": cmd_f1,
     "truth": cmd_truth}[args.cmd](args)


if __name__ == "__main__":
    main()
