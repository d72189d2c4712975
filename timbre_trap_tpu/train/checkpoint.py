"""Checkpointing via orbax (params + optimizer state + step counter).

The reference saves whole torch modules every 250 batches and does NOT
persist optimizer state (``experiments/train.py:502-511``; resume restarts
AdamW). Here checkpoints are param/opt-state pytrees with the step counter,
so resume is exact; ``save_checkpoint`` is synchronous and atomic via orbax.
"""

import os

import numpy as np
import jax
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "load_params"]


def load_params(path):
    """Extract a parameter tree from either checkpoint layout.

    Accepts a trainer checkpoint directory (params + opt_state + step) or a
    ``model.save`` directory (hparams.json + weights/).
    """
    weights_dir = os.path.join(path, "weights")
    if os.path.isdir(weights_dir):
        return load_checkpoint(weights_dir)["params"]
    return load_checkpoint(path)["params"]


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path, params, opt_state=None, step=0):
    """Save a training state under ``path`` (created or replaced)."""
    path = os.path.abspath(path)
    state = {"params": _to_host(params), "step": np.asarray(step)}
    if opt_state is not None:
        state["opt_state"] = _to_host(opt_state)
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(path, state, force=True)
    checkpointer.wait_until_finished()
    return path


def load_checkpoint(path, target=None):
    """Restore a training state; ``target`` (optional) supplies structure.

    Returns the raw state dict {'params', 'opt_state'?, 'step'}.
    """
    path = os.path.abspath(path)
    checkpointer = ocp.StandardCheckpointer()
    if target is not None:
        target = {k: _to_host(v) if k != "step" else np.asarray(v)
                  for k, v in target.items()}
        return checkpointer.restore(path, target=target)
    return checkpointer.restore(path)


def latest_checkpoint(directory, prefix="model-"):
    """Path of the highest-step checkpoint under ``directory`` (or None)."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if name.startswith(prefix):
            try:
                step = int(name[len(prefix):])
            except ValueError:
                continue
            if step > best_step:
                best, best_step = os.path.join(directory, name), step
    return best
