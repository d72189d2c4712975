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

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch", "P"]

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
