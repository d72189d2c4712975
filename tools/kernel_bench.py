"""Scan-amortized kernel benchmarking harness.

Per-call dispatch on tunneled TPU runtimes is ~33 ms, so timing a single op
only measures the dispatch floor. This harness runs a candidate op N times
inside one ``lax.scan`` (data-dependent carry so XLA cannot elide
iterations) and reports per-iteration time — the methodology required for
any kernel work on this stack (docs/ROADMAP.md).

Usage:
    python tools/kernel_bench.py            # built-in conv layout study
    python tools/kernel_bench.py conv      # same, explicitly
    python tools/kernel_bench.py int8      # int8-vs-bf16 MXU matmul study
    python tools/kernel_bench.py bwd [bfloat16|float32]
                                           # per-level fused fwd vs bwd cost
Unknown study names are an error (not a silent fall-through to conv).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from timbre_trap_tpu.utils import enable_persistent_compilation_cache


def bench_op(fn, args, iters=100, reps=3):
    """Per-iteration seconds for ``fn(*args)`` amortized inside a scan.

    The FIRST argument is perturbed by the (tiny) carry each iteration so
    the op is NOT loop-invariant — XLA hoists loop-invariant computations
    out of the scan entirely, which silently turns this harness into a
    dispatch-floor measurement (round-1 numbers had this flaw: per-conv
    costs looked flat across a 16x FLOP range because only one conv ran).

    The carry must also consume EVERY output element through a reduction
    XLA cannot push through the op: feeding ``ravel(out)[0]`` back lets the
    algebraic simplifier rewrite slice(dot) -> dot(slice) and compute one
    output ROW instead of the whole product (measured: a 2048^3 and a
    128x384x640 dot both "cost" ~160us that way — pure dispatch floor).
    ``max`` has no such decomposition over the contracted dimension.
    """

    @jax.jit
    def run(args):
        def body(carry, _):
            first = args[0] + carry.astype(args[0].dtype)
            out = fn(first, *args[1:])
            s = jnp.max(jnp.real(out)).astype(jnp.float32)
            return s * 1e-30, None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    float(run(args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(args))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def conv_layout_study():
    """NHWC lax conv vs NCHW 9-shift einsum at each model level's shape."""
    rng = np.random.default_rng(0)
    B, T, d = 4, 1024, 2

    def conv_nhwc(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_nchw_shift(x, w):
        xp = jnp.pad(x, ((0, 0), (0, 0), (d, d), (d, d)))
        out = 0.0
        for df in range(3):
            for dt in range(3):
                seg = jax.lax.dynamic_slice(xp, (0, 0, df * d, dt * d),
                                            x.shape)
                out = out + jnp.einsum("co,bcft->boft",
                                       w[df, dt], seg)
        return out

    print(f"{'level (C,F)':>14} {'NHWC conv':>12} {'NCHW shift':>12}")
    for C, F in ((4, 540), (8, 269), (16, 133), (32, 65), (64, 31)):
        x_nhwc = jnp.asarray(rng.standard_normal((B, F, T, C)),
                             dtype=jnp.float32)
        x_nchw = jnp.transpose(x_nhwc, (0, 3, 1, 2))
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.float32)

        # correctness first
        ya = np.transpose(np.asarray(conv_nhwc(x_nhwc, w)), (0, 3, 1, 2))
        yb = np.asarray(conv_nchw_shift(x_nchw, w))
        err = np.abs(ya - yb).max() / max(np.abs(ya).max(), 1e-9)
        assert err < 2e-5, f"mismatch at C={C}: {err}"

        ta = bench_op(conv_nhwc, (x_nhwc, w))
        tb = bench_op(conv_nchw_shift, (x_nchw, w))
        print(f"{f'({C},{F})':>14} {ta * 1e6:>10.0f}us {tb * 1e6:>10.0f}us")


def int8_matmul_study():
    """Measure whether int8 MXU throughput would speed the fused levels.

    docs/ROADMAP.md r4 item 3: "further wins need a faster fused level
    (e.g. int8 activations) — measure before building". The fused level
    kernels' hot op is the repeating banded-block matmul
    ``dot_general((128, K), (K, W))`` (ops/fused_level.py:_conv_stage) with
    K = 128 + 2*margin rows and W = tile_t + 2*64 columns; a whole level is
    ~16 such output blocks x ~7 convs x 3 time taps. v5e's MXU peaks at
    2x bf16 throughput for int8 operands with int32 accumulation — IF the
    dot is MXU-bound at these shapes rather than bound by operand staging.

    This study times the block shape, a 16-block aggregate (same weight
    block against 16 tiles' worth of columns — what a level amortizes to),
    and a large square control, each as f32-HIGHEST (the inference
    reconstruction mode), bf16-default (the transcribe/training mode), and
    int8->int32. The int8:bf16 ratio at the AGGREGATE shape is the decision
    number for an int8 fused level.
    """
    rng = np.random.default_rng(0)

    def dot(a, b):
        acc = jnp.int32 if a.dtype == jnp.int8 else jnp.float32
        prec = "highest" if a.dtype == jnp.float32 else "default"
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=prec,
                                   preferred_element_type=acc)

    shapes = [
        ("block (128,384)x(384,640)", 128, 384, 640),
        ("level-agg (128,384)x(384,10240)", 128, 384, 10240),
        ("control (2048,2048)x(2048,2048)", 2048, 2048, 2048),
    ]
    # "int8 speedup" is THROUGHPUT speedup (bf16_time / int8_time, higher =
    # int8 faster) — the convention PERFORMANCE.md/ROADMAP.md report
    # ("~1.25x bf16" at the control shape, "~1.0x" at the aggregate).
    print(f"{'shape':>34} {'f32-hi':>10} {'bf16':>10} {'int8':>10} "
          f"{'int8 speedup':>13}")
    for name, m, k, n in shapes:
        a_f = rng.standard_normal((m, k)).astype(np.float32)
        b_f = rng.standard_normal((k, n)).astype(np.float32)
        rows = {}
        for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
            if dt == jnp.int8:
                a = jnp.asarray(np.clip(a_f * 32, -127, 127), jnp.int8)
                b = jnp.asarray(np.clip(b_f * 32, -127, 127), jnp.int8)
            else:
                a, b = jnp.asarray(a_f, dt), jnp.asarray(b_f, dt)
            rows[dt.__name__] = bench_op(dot, (a, b), iters=200)
        speedup = rows["bfloat16"] / rows["int8"]
        print(f"{name:>34} {rows['float32'] * 1e6:>8.1f}us "
              f"{rows['bfloat16'] * 1e6:>8.1f}us {rows['int8'] * 1e6:>8.1f}us "
              f"{speedup:>12.2f}x")


def fused_bwd_study(dtype_name="bfloat16"):
    """Per-level fused forward vs VJP cost at the reference recipe shape.

    The train-step phase table (docs/PERFORMANCE.md) shows backward+dW at
    ~3.2x the forward after recompute elimination — more than the ~2x an
    MXU-rate model predicts. This study localizes the excess per LEVEL
    (B=8, T = recipe frames, flagship geometry) by timing each level's
    Pallas forward alone and its full VJP (forward + backward kernel) with
    the level's own output as cotangent. ``bwd`` is the difference — one
    backward kernel including dX adjoints, dW/dB accumulation, and the
    terminal-item replay.
    """
    from timbre_trap_tpu.models import TimbreTrap
    from timbre_trap_tpu.models.modules import embedding_sizes
    from timbre_trap_tpu.ops.fused_level import (decoder_level_spec,
                                                 encoder_level_spec,
                                                 make_fused_level_train)

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    m = TimbreTrap(sample_rate=22050, n_octaves=9, bins_per_octave=60,
                   secs_per_block=3, latent_size=128, model_complexity=2)
    M = m.sliCQ.get_expected_frames(m.sliCQ.block_length * 3)
    B = 8
    params = m.params
    sizes, paddings = embedding_sizes(m.net.feature_size)
    specs = []
    f = m.net.feature_size
    for i in range(4):
        spec = encoder_level_spec(
            params["encoder"][f"block{i + 1}"], f,
            convin_params=(params["encoder"]["convin"] if i == 0 else None),
            with_adjoints=True)
        specs.append((f"enc{i + 1}", spec))
        f = sizes[i]
    f = sizes[-1]
    for i in range(4):
        spec = decoder_level_spec(
            params["decoder"][f"block{i + 1}"], f,
            output_padding=paddings[i],
            convout_params=(params["decoder"]["convout"] if i == 3
                            else None),
            with_adjoints=True)
        specs.append((f"dec{i + 1}", spec))
        f = spec.items[0][1].f_out

    rng = np.random.default_rng(0)
    tot_f = tot_b = 0.0
    print(f"recipe shape B={B} T={M} dtype={dtype_name}")
    print(f"{'level':>6} {'r_in':>6} {'r_out':>6} {'fwd':>10} "
          f"{'fwd+bwd':>10} {'bwd':>10} {'bwd:fwd':>8}")
    for name, spec in specs:
        fn = make_fused_level_train(spec, dtype=dtype)
        arrays = tuple(spec.weight_arrays(jnp.float32)
                       + spec.adjoint_arrays(jnp.float32))
        g = spec.geom()
        x = jnp.asarray(rng.standard_normal((B, g.r_in, M)) * 0.1,
                        jnp.float32)

        def fwd(x_, *a):
            return fn(x_, *a)

        def fwd_bwd(x_, *a):
            y, vjp = jax.vjp(fn, x_, *a)
            return vjp(y)[0]  # dX with the level's own output as cotangent

        tf = bench_op(fwd, (x,) + arrays, iters=10)
        tfb = bench_op(fwd_bwd, (x,) + arrays, iters=10)
        tb = tfb - tf
        tot_f += tf
        tot_b += tb
        print(f"{name:>6} {g.r_in:>6} {g.r_out:>6} {tf*1e3:>8.2f}ms "
              f"{tfb*1e3:>8.2f}ms {tb*1e3:>8.2f}ms {tb/tf:>7.2f}x")
    print(f"{'total':>6} {'':>6} {'':>6} {tot_f*1e3:>8.2f}ms "
          f"{'':>10} {tot_b*1e3:>8.2f}ms {tot_b/tot_f:>7.2f}x")


if __name__ == "__main__":
    enable_persistent_compilation_cache()
    study = sys.argv[1] if len(sys.argv) > 1 else "conv"
    if study == "int8":
        int8_matmul_study()
    elif study == "conv":
        conv_layout_study()
    elif study == "bwd":
        fused_bwd_study(sys.argv[2] if len(sys.argv) > 2 else "bfloat16")
    else:
        sys.exit(f"unknown study {study!r}; available: conv, int8, bwd")
