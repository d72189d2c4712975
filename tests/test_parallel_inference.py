"""Sharded long-form inference must match single-device chunked inference."""

import numpy as np
import pytest

import jax

from timbre_trap_tpu.models import TimbreTrap
from timbre_trap_tpu.parallel import make_mesh, make_sharded_chunked_inference


@pytest.fixture(scope="module")
def tiny_model():
    return TimbreTrap(sample_rate=8000, n_octaves=5, bins_per_octave=12,
                      secs_per_block=0.5, latent_size=16, model_complexity=1)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single(tiny_model, n_devices, rng):
    assert jax.device_count() >= n_devices
    m = tiny_model
    L = m.sliCQ.block_length
    audio = rng.standard_normal((1, 1, int(3.4 * L))).astype(np.float32)

    single = np.asarray(m.chunked_inference(audio, True))

    mesh = make_mesh(n_devices)
    run = make_sharded_chunked_inference(m, mesh, transcribe=True)
    sharded = np.asarray(run(m.params, audio))

    assert sharded.shape == single.shape
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def test_sharded_batch(tiny_model, rng):
    m = tiny_model
    L = m.sliCQ.block_length
    audio = rng.standard_normal((2, 1, 2 * L)).astype(np.float32)
    mesh = make_mesh(4)
    run = make_sharded_chunked_inference(m, mesh, transcribe=False)
    out = np.asarray(run(m.params, audio))
    single = np.asarray(m.chunked_inference(audio, False))
    np.testing.assert_allclose(out, single, atol=2e-5)


def test_profiling_timer():
    from timbre_trap_tpu.utils.profiling import Timer

    timer = Timer()
    with timer("section"):
        pass
    with timer("section"):
        pass
    s = timer.summary()
    assert s["section"]["count"] == 2
