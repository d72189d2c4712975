import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from concurrent.futures import ThreadPoolExecutor
import numpy as np, jax, jax.numpy as jnp

def log(*a): print(*a, flush=True)
x = np.random.default_rng(0).standard_normal(13_230_000).astype(np.float32)  # 53MB
xi = (x * 1000).astype(np.int16)

# serial upload timing
for arr, name in ((x, "f32 53MB"), (xi, "i16 26MB")):
    jax.device_put(arr[:1000]).block_until_ready()
    t0 = time.perf_counter(); d = jax.device_put(arr); s = float(jnp.sum(jnp.asarray(d, jnp.float32)[:8]))
    log(f"{name} upload+touch: {time.perf_counter()-t0:.2f}s")

# is device_put blocking? time just the call
t0 = time.perf_counter(); d = jax.device_put(x); t1 = time.perf_counter()
float(jnp.sum(d[:8])); t2 = time.perf_counter()
log(f"device_put call {t1-t0:.2f}s, first touch {t2-t1:.2f}s")

# two parallel streams
halves = [x[:len(x)//2], x[len(x)//2:]]
with ThreadPoolExecutor(2) as pool:
    t0 = time.perf_counter()
    futs = [pool.submit(jax.device_put, h) for h in halves]
    ds = [f.result() for f in futs]
    for d in ds: float(jnp.sum(d[:8]))
    log(f"2-stream upload: {time.perf_counter()-t0:.2f}s")

# overlap upload with compute
w = jax.device_put(np.random.default_rng(1).standard_normal((2048, 2048)).astype(np.float32))
@jax.jit
def burn(w):
    def body(c, _):
        return jnp.tanh(c @ w), None
    out, _ = jax.lax.scan(body, w, None, length=200)
    return out
float(jnp.sum(burn(w)))  # warm
t0 = time.perf_counter(); float(jnp.sum(burn(w))); tb = time.perf_counter() - t0
log(f"burn alone: {tb:.2f}s")
t0 = time.perf_counter()
with ThreadPoolExecutor(1) as pool:
    fut = pool.submit(jax.device_put, x)
    r = burn(w)
    d = fut.result()
    float(jnp.sum(r)); float(jnp.sum(d[:8]))
log(f"burn + overlapped upload: {time.perf_counter()-t0:.2f}s")
