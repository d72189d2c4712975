"""Scan-amortized kernel benchmarking harness.

Per-call dispatch on tunneled TPU runtimes is ~33 ms, so timing a single op
only measures the dispatch floor. This harness runs a candidate op N times
inside one ``lax.scan`` (data-dependent carry so XLA cannot elide
iterations) and reports per-iteration time — the methodology required for
any kernel work on this stack (docs/ROADMAP.md).

Usage:
    python tools/kernel_bench.py            # built-in conv layout study
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def bench_op(fn, args, iters=100, reps=3):
    """Per-iteration seconds for ``fn(*args)`` amortized inside a scan.

    The FIRST argument is perturbed by the (tiny) carry each iteration so
    the op is NOT loop-invariant — XLA hoists loop-invariant computations
    out of the scan entirely, which silently turns this harness into a
    dispatch-floor measurement (round-1 numbers had this flaw: per-conv
    costs looked flat across a 16x FLOP range because only one conv ran).
    """

    @jax.jit
    def run(args):
        def body(carry, _):
            first = args[0] + carry.astype(args[0].dtype)
            out = fn(first, *args[1:])
            s = jnp.real(jnp.ravel(out)[0]).astype(jnp.float32)
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


if __name__ == "__main__":
    conv_layout_study()
