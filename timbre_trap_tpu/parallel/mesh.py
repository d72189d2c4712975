"""Device-mesh helpers for data-parallel training and sharded inference.

The reference scales out with single-host ``torch.nn.DataParallel``
(``timbre_trap/utils/experiments.py:67-78``; engaged at
``experiments/train.py:166-168``). The TPU-native equivalent is a 1-D
``data`` mesh: batches are sharded over devices, parameters are replicated,
and XLA emits the gradient all-reduce over ICI. These helpers centralize
mesh/sharding construction so training and inference use consistent axis
names.
"""

from dataclasses import dataclass, field
from typing import List

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch",
           "shard_global_batch", "plan_local_rows", "LocalBatchPlan", "P"]

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


def shard_global_batch(mesh, batch, axis_name=DATA_AXIS, local=False):
    """Build globally batch-sharded arrays from per-host batch pytrees.

    Single-process: identical to :func:`shard_batch`. Multi-process (pod
    runs after :func:`..distributed.initialize`), ``local=False``: every
    host passes the SAME logical global batch; each keeps only its
    ``local_batch_slice`` rows and the global array is assembled without
    any cross-host copy via ``jax.make_array_from_process_local_data``.
    Leading dims must divide ``jax.process_count()``.

    ``local=True``: each host passes ONLY its own rows (the
    ``local_batch_slice`` of the global batch, produced by loaders
    configured with :func:`plan_local_rows`) — the O(1/n_processes) input
    path; the global leading dim is ``local_rows * n_processes``.
    """
    n_proc = jax.process_count()
    if n_proc == 1:
        return shard_batch(mesh, batch, axis_name)
    sharding = batch_sharded(mesh, axis_name)

    def _one(x):
        x = np.asarray(x)
        if local:
            global_shape = (x.shape[0] * n_proc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)
        if x.shape[0] % n_proc:
            raise ValueError(
                f"global batch {x.shape[0]} not divisible by "
                f"{n_proc} processes")
        per = x.shape[0] // n_proc
        lo = jax.process_index() * per
        return jax.make_array_from_process_local_data(
            sharding, x[lo:lo + per], x.shape)

    return jax.tree.map(_one, batch)


@dataclass(frozen=True)
class LocalBatchPlan:
    """Which rows of each per-batch loader draw THIS process materializes.

    The global training batch is ``[mpe rows | audio-only rows]`` (train/
    step.py loss composition) and two global arrays are sharded over their
    own leading axes: audio ``(mpe+audio, 1, N)`` and ground truth
    ``(mpe, F, T)``. A process owns audio rows ``[p*B/n, (p+1)*B/n)`` and
    ground-truth rows ``[p*mpe/n, (p+1)*mpe/n)`` — ranges that do NOT
    select the same MPE items in general, so an MPE item can be loaded by
    up to two processes (one for its audio, one for its raster). Total
    loads are still <= (B + mpe)/n per process, vs the full B + mpe of
    naive per-host global composition.
    """

    mpe_rows: List[int]        # MPE-loader batch positions to load
    mpe_audio_pos: List[int]   # positions WITHIN mpe_rows feeding the audio shard
    gt_pos: List[int]          # positions WITHIN mpe_rows feeding the GT shard
    audio_rows: List[int]      # audio-only-loader batch positions to load


def plan_local_rows(mpe_batch_size, audio_batch_size=0, n_processes=None,
                    process_index=None):
    """Compute this process's :class:`LocalBatchPlan` for one global batch.

    ``None`` when single-process (no slicing needed). Both the total batch
    and the MPE batch must divide the process count (the same constraint
    ``shard_global_batch`` enforces on the arrays).
    """
    n = jax.process_count() if n_processes is None else n_processes
    if n == 1:
        return None
    p = jax.process_index() if process_index is None else process_index
    total = mpe_batch_size + audio_batch_size
    if total % n or mpe_batch_size % n:
        raise ValueError(
            f"batch sizes (total={total}, mpe={mpe_batch_size}) must divide "
            f"{n} processes")
    a_lo, a_hi = p * total // n, (p + 1) * total // n
    g_lo, g_hi = p * mpe_batch_size // n, (p + 1) * mpe_batch_size // n
    mpe_audio = list(range(a_lo, min(a_hi, mpe_batch_size)))
    gt_rows = list(range(g_lo, g_hi))
    mpe_rows = sorted(set(mpe_audio) | set(gt_rows))
    pos = {row: i for i, row in enumerate(mpe_rows)}
    audio_rows = list(range(max(a_lo, mpe_batch_size) - mpe_batch_size,
                            a_hi - mpe_batch_size)) if a_hi > mpe_batch_size \
        else []
    return LocalBatchPlan(
        mpe_rows=mpe_rows,
        mpe_audio_pos=[pos[r] for r in mpe_audio],
        gt_pos=[pos[r] for r in gt_rows],
        audio_rows=audio_rows)
