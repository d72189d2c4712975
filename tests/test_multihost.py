"""Multi-host (two-process) data-sharding tests.

Two OS processes x 2 virtual CPU devices each, joined via jax.distributed
(Gloo collectives), run one DP train step where each process feeds only its
local_batch_slice of the global batch. The result must match a
single-process run of the same global batch — validating the pod-scale
input path (SURVEY.md §2.6; the reference is single-process only).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from timbre_trap_tpu.parallel import make_mesh, shard_batch
from timbre_trap_tpu.train import (TrainConfig, init_train_state,
                                   make_train_step, shard_train_step)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_loss():
    """The worker's computation, single-process, on a 4-device mesh."""
    from timbre_trap_tpu.models import TimbreTrap

    model = TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                       secs_per_block=0.5, latent_size=16, model_complexity=1)
    config = TrainConfig(multiplier_consistency=1.0)
    step = make_train_step(model, config, mpe_batch_size=4)
    params, opt_state = init_train_state(model, config)

    rng = np.random.default_rng(0)
    L, M = model.sliCQ.block_length, model.sliCQ.max_window_length
    audio = (rng.standard_normal((4, 1, L)) * 0.1).astype(np.float32)
    gt = (rng.uniform(size=(4, model.sliCQ.n_bins, M)) > 0.97).astype(np.float32)

    mesh = make_mesh(4)
    sharded_step = shard_train_step(step, mesh)
    audio, gt = shard_batch(mesh, (audio, gt))
    _, _, metrics = sharded_step(params, opt_state, audio, gt, 1e-3)
    return float(metrics["loss/total"])


def test_two_process_data_sharding():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    # The worker sets its own XLA_FLAGS/JAX_PLATFORMS before importing jax.
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]

    losses = []
    for i, (proc, out) in enumerate(zip(procs, outs)):
        assert proc.returncode == 0, f"worker {i} failed:\n{out}"
        match = re.search(r"LOSS ([0-9.]+)", out)
        assert match, f"worker {i} printed no loss:\n{out}"
        losses.append(float(match.group(1)))

    assert np.isfinite(losses[0])
    assert losses[0] == losses[1]  # replicated outputs agree across hosts
    assert losses[0] == pytest.approx(_reference_loss(), rel=1e-4)


def test_initialize_raises_on_explicit_misconfiguration():
    """An explicitly requested pod that cannot form must raise, not silently
    degrade to single-host training."""
    from timbre_trap_tpu.parallel import initialize

    with pytest.raises((RuntimeError, ValueError)):
        # Invalid: explicit num_processes without a coordinator address.
        initialize(coordinator_address=None, num_processes=2, process_id=0)


def test_local_batch_slice_single_process():
    from timbre_trap_tpu.parallel import is_multi_host, local_batch_slice

    assert not is_multi_host()
    assert local_batch_slice(8) == (0, 8)
