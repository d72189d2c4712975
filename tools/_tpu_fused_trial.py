import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import numpy as np, jax, jax.numpy as jnp
from timbre_trap_tpu.models.modules import EncoderBlock
from timbre_trap_tpu.ops.packed_conv import pack_nhwc, unpack_to_nhwc
from timbre_trap_tpu.ops.fused_level import encoder_level_spec, fused_level_apply

print(jax.devices())

def bench(fn, x, iters=30):
    # Carry-dependent input: defeats while-loop invariant code motion, so
    # every iteration really runs (r1 kernel_bench lacked this -> bogus).
    @jax.jit
    def run(x):
        def body(carry, _):
            out = fn(x + carry)
            s = jnp.ravel(out)[0].astype(jnp.float32)
            return s * 1e-30, None
        tot, _ = jax.lax.scan(body, jnp.float32(0.), None, length=iters)
        return tot
    float(run(x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(x)); ts.append((time.perf_counter()-t0)/iters)
    return min(ts)

rng = np.random.default_rng(0)
B, T = 4, 1024
print(f"{'level':>10} {'flax':>9} {'f32':>9} {'bf16':>9} {'eflax':>9} {'e32':>9} {'e16':>9}")
for C, F in [(4, 540), (8, 269), (16, 133), (32, 65)]:
    x = jnp.asarray(rng.standard_normal((B, F, T, C)), jnp.float32)
    mod = EncoderBlock(out_channels=2*C)
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    with jax.default_matmul_precision("highest"):
        ref = jax.jit(lambda x: mod.apply({"params": params}, x))(x)
    ref_d = mod.apply({"params": params}, x)
    den = float(jnp.max(jnp.abs(ref)))
    spec = encoder_level_spec(params, F)
    xp = pack_nhwc(x)
    e_flax = float(jnp.max(jnp.abs(ref_d - ref)))/den
    errs, times = [], [bench(lambda x: mod.apply({"params": params}, x), x)]
    for dt in (jnp.float32, jnp.bfloat16):
        out = fused_level_apply(xp, spec, dtype=dt)
        err = float(jnp.max(jnp.abs(unpack_to_nhwc(out.astype(jnp.float32), 2*C) - ref)))/den
        errs.append(err)
        times.append(bench(lambda xp: fused_level_apply(xp, spec, dtype=dt), xp))
    print(f"{f'C={C}':>10} {times[0]*1e6:>7.0f}us {times[1]*1e6:>7.0f}us {times[2]*1e6:>7.0f}us {e_flax:>9.1e} {errs[0]:>9.1e} {errs[1]:>9.1e}")
