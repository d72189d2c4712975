"""Device-mesh helpers for data-parallel training and sharded inference.

The reference scales out with single-host ``torch.nn.DataParallel``
(``timbre_trap/utils/experiments.py:67-78``; engaged at
``experiments/train.py:166-168``). The TPU-native equivalent is a 1-D
``data`` mesh: batches are sharded over devices, parameters are replicated,
and XLA emits the gradient all-reduce over ICI. These helpers centralize
mesh/sharding construction so training and inference use consistent axis
names.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch",
           "shard_global_batch", "P"]

DATA_AXIS = "data"


def make_mesh(n_devices=None, axis_name=DATA_AXIS, devices=None):
    """Create a 1-D mesh over the first ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh):
    """Sharding that replicates an array on every device of the mesh."""
    return NamedSharding(mesh, P())


def batch_sharded(mesh, axis_name=DATA_AXIS):
    """Sharding that splits the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh, batch, axis_name=DATA_AXIS):
    """Device-put a pytree of batch arrays with the leading axis sharded."""
    sharding = batch_sharded(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_global_batch(mesh, batch, axis_name=DATA_AXIS):
    """Build globally batch-sharded arrays from per-host batch pytrees.

    Single-process: identical to :func:`shard_batch`. Multi-process (pod
    runs after :func:`..distributed.initialize`): every host passes the
    SAME logical global batch; each keeps only its ``local_batch_slice``
    rows and the global array is assembled without any cross-host copy via
    ``jax.make_array_from_process_local_data``. Leading dims must divide
    ``jax.process_count()``.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch(mesh, batch, axis_name)
    sharding = batch_sharded(mesh, axis_name)

    def _one(x):
        x = np.asarray(x)
        if x.shape[0] % n_proc:
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by "
                f"{n_proc} processes")
        per = x.shape[0] // n_proc
        lo = jax.process_index() * per
        return jax.make_array_from_process_local_data(
            sharding, x[lo:lo + per], x.shape)

    return jax.tree.map(_one, batch)
