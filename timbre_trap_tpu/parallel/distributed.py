"""Multi-host initialization for pod-scale runs.

The reference has no distributed backend at all (SURVEY.md §2.6). For
multi-host TPU slices the JAX global runtime handles process coordination;
this module wraps the boilerplate: call :func:`initialize` once at program
start on every host, then build meshes over ``jax.devices()`` (which then
spans the full slice) exactly as in single-host code — all collectives are
emitted by XLA over ICI/DCN.
"""

import logging

import jax

__all__ = ["initialize", "is_multi_host", "local_batch_slice"]

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime; returns True on success.

    With no arguments, cluster autodetection is used (TPU pods populate the
    environment). Safe to call unconditionally on a single host — but a
    FAILED pod initialization is never silent: the exception is logged so a
    misconfigured cluster can't quietly degrade to single-host training.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return True
    except (RuntimeError, ValueError) as exc:
        if "already initialized" in str(exc):
            return True
        explicit = (coordinator_address is not None
                    or num_processes is not None or process_id is not None)
        if explicit:
            # An explicitly requested pod that fails to form is an error,
            # not a silent fallback to single-host training.
            logger.error("jax.distributed.initialize failed: %s "
                         "(coordinator=%s num_processes=%s process_id=%s)",
                         exc, coordinator_address, num_processes, process_id)
            raise
        logger.info("jax.distributed autodetection found no cluster (%s); "
                    "continuing single-process.", exc)
        return False


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
