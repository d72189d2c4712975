"""Persistent XLA compilation cache, keyed per machine.

Flagship-size programs take 2-16 minutes to compile on remote-compile TPU
runtimes; the persistent cache turns reruns (benchmarks, repeated training
launches) into cache hits. The cache directory embeds a host fingerprint:
XLA:CPU AOT entries bake in machine features, and a cache carried across
machines forces slow recompiles (which can even break time-sensitive paths
like multi-process Gloo rendezvous — see tests/multihost_worker.py).
"""

import hashlib
import os
import platform

__all__ = ["enable_persistent_compilation_cache"]


def enable_persistent_compilation_cache(base_dir=None,
                                        min_compile_secs=2.0):
    """Idempotently point jax at a machine-keyed on-disk compile cache."""
    import jax

    tag = hashlib.sha1(
        (platform.node() + platform.processor()).encode()).hexdigest()[:8]
    path = os.path.join(base_dir or "/tmp", f"tt_tpu_xla_cache_{tag}")
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return path
