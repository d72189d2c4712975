"""Shared training-throughput measurement (bench.py + tools/tpu_perf.py).

One definition of the reference-recipe step benchmark (batch 8 x 9-s
crops, consistency on — reference train.py:39-101) so the two callers
cannot drift. Timing forces execution with a scalar fetch per step
(``float(...)``) — ``block_until_ready`` is not a reliable sync on
tunneled TPU runtimes (.claude/skills/verify/SKILL.md).
"""

import time

import numpy as np

__all__ = ["reference_recipe_step_time"]


def reference_recipe_step_time(model, conv_backend, batch=8, blocks=3,
                               iters=3, lr=1e-3, seed=0,
                               return_memory=False):
    """Measure one training-step wall time at the reference recipe.

    Returns ``(step_seconds, first_loss)`` where ``step_seconds`` is the
    min over ``iters`` post-compile steps (each including the scalar-fetch
    sync) and ``first_loss`` the compile-step loss (a cheap numerics
    regression signal: backends must agree to ~1e-3 relative).

    ``return_memory=True`` appends the compiled step's XLA
    ``memory_analysis().peak_memory_in_bytes`` (device HBM high-water mark:
    arguments + outputs + temporaries) as a third element.
    """
    import jax
    import jax.numpy as jnp

    from .step import TrainConfig, init_train_state, make_train_step

    cfg = TrainConfig(multiplier_consistency=1.0)
    L = model.sliCQ.block_length * blocks
    M = model.sliCQ.get_expected_frames(L)
    rng = np.random.default_rng(seed)
    audio = jnp.asarray(rng.standard_normal((batch, 1, L)) * 0.1,
                        jnp.float32)
    gt = jnp.asarray(
        (rng.uniform(size=(batch, model.sliCQ.n_bins, M)) > 0.97),
        jnp.float32)

    step = jax.jit(make_train_step(model, cfg, mpe_batch_size=batch,
                                   conv_backend=conv_backend))
    params, opt = init_train_state(model, cfg)
    params, opt, met = step(params, opt, audio, gt, lr)
    first_loss = float(met["loss/total"])

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        params, opt, met = step(params, opt, audio, gt, lr)
        float(met["loss/total"])
        best = min(best, time.perf_counter() - t0)
    if return_memory:
        peak = step.lower(params, opt, audio, gt, lr).compile() \
            .memory_analysis().peak_memory_in_bytes
        return best, first_loss, peak
    return best, first_loss
