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


def _default_base_dir():
    """Per-user cache root (0700): a world-writable /tmp path would let
    another local user pre-create and poison serialized executables that
    XLA later deserializes and runs."""
    root = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    if root.startswith("~"):  # no resolvable home — fall back to a uid dir
        root = f"/tmp/tt_tpu_cache_uid{os.getuid()}"
    return os.path.join(root, "timbre_trap_tpu")


def enable_persistent_compilation_cache(base_dir=None,
                                        min_compile_secs=2.0):
    """Idempotently point jax at a machine-keyed on-disk compile cache."""
    import jax

    tag = hashlib.sha1(
        (platform.node() + platform.processor()).encode()).hexdigest()[:8]
    base = base_dir or _default_base_dir()
    path = os.path.join(base, f"tt_tpu_xla_cache_{tag}")
    try:
        os.makedirs(path, mode=0o700, exist_ok=True)
    except OSError:  # unwritable base dir — let jax fail/skip on its own
        pass
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
    except Exception:  # pragma: no cover - older jax without the knobs
        return None
    return path
