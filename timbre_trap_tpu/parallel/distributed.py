"""Multi-host initialization for pod-scale runs.

The reference has no distributed backend at all (SURVEY.md §2.6). For
multi-host TPU slices the JAX global runtime handles process coordination;
this module wraps the boilerplate: call :func:`initialize` once at program
start on every host, then build meshes over ``jax.devices()`` (which then
spans the full slice) exactly as in single-host code — all collectives are
emitted by XLA over ICI/DCN.
"""

import jax

__all__ = ["initialize", "is_multi_host", "local_batch_slice"]


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (no-op on single host).

    With no arguments, cluster autodetection is used (TPU pods populate the
    environment). Safe to call unconditionally.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (RuntimeError, ValueError):
        # Already initialized, or single-process environment.
        pass


def is_multi_host():
    return jax.process_count() > 1


def local_batch_slice(global_batch_size):
    """(start, stop) rows of the global batch this host should load.

    Hosts feed only their local shard; combine with
    ``jax.make_array_from_process_local_data`` for global arrays.
    """
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return start, start + per_host
