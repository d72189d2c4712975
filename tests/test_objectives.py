"""Objective-function parity tests against hand-computed references."""

import numpy as np
import pytest

from timbre_trap_tpu.objectives import (
    compute_consistency_loss,
    compute_reconstruction_loss,
    compute_transcription_loss,
)


def test_reconstruction_loss(rng):
    a = rng.standard_normal((2, 2, 5, 7)).astype(np.float32)
    b = rng.standard_normal((2, 2, 5, 7)).astype(np.float32)
    got = float(compute_reconstruction_loss(a, b))
    ref = ((a - b) ** 2).sum(axis=-3).sum(axis=-2).mean()
    assert got == pytest.approx(float(ref), rel=1e-5)


def test_reconstruction_loss_zero():
    a = np.ones((1, 2, 3, 4), np.float32)
    assert float(compute_reconstruction_loss(a, a)) == 0.0


def test_transcription_loss_unweighted(rng):
    est = rng.uniform(size=(2, 6, 4)).astype(np.float32)
    tgt = (rng.uniform(size=(2, 6, 4)) > 0.7).astype(np.float32)
    got = float(compute_transcription_loss(est, tgt))
    ref = ((est - tgt) ** 2).sum(axis=-2).mean()
    assert got == pytest.approx(float(ref), rel=1e-5)


def test_transcription_loss_weighted():
    # One frame, 4 bins, 1 positive: positive loss scaled by neg/pos = 3.
    est = np.zeros((1, 4, 1), np.float32)
    tgt = np.array([[[1.0], [0.0], [0.0], [0.0]]], np.float32)
    unweighted = float(compute_transcription_loss(est, tgt, False))
    weighted = float(compute_transcription_loss(est, tgt, True))
    assert unweighted == pytest.approx(1.0)
    assert weighted == pytest.approx(3.0, rel=1e-4)


def test_transcription_loss_weighted_all_negative():
    # No positives: scaling must collapse to 1 everywhere (no NaN/inf).
    est = 0.5 * np.ones((1, 4, 2), np.float32)
    tgt = np.zeros((1, 4, 2), np.float32)
    weighted = float(compute_transcription_loss(est, tgt, True))
    assert weighted == pytest.approx(4 * 0.25, rel=1e-5)


def test_consistency_loss(rng):
    sp = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    sc = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    tg = rng.standard_normal((1, 2, 3, 4)).astype(np.float32)
    l_sp, l_sc = compute_consistency_loss(sp, sc, tg)
    assert float(l_sp) == pytest.approx(float(compute_reconstruction_loss(sp, tg)), rel=1e-6)
    assert float(l_sc) == pytest.approx(float(compute_reconstruction_loss(sc, tg)), rel=1e-6)


def test_losses_differentiable(rng):
    import jax
    import jax.numpy as jnp

    est = jnp.asarray(rng.uniform(size=(1, 4, 3)).astype(np.float32))
    tgt = jnp.asarray((rng.uniform(size=(1, 4, 3)) > 0.5).astype(np.float32))
    g = jax.grad(lambda e: compute_transcription_loss(e, tgt, True))(est)
    assert np.isfinite(np.asarray(g)).all()
