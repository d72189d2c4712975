"""Tests for gradient telemetry and visualization utilities."""

import numpy as np
import pytest

from timbre_trap_tpu.utils import (
    average_gradient_norms,
    get_max_gradient,
    get_max_gradient_norm,
    log_gradient_norms,
    sum_gradient_norms,
)


@pytest.fixture()
def grads():
    return {"encoder": {"w": np.array([3.0, 4.0])},      # norm 5
            "decoder": {"w": np.array([0.0, -2.0])}}     # norm 2


def test_gradient_norm_stats(grads):
    assert sum_gradient_norms(grads) == pytest.approx(7.0)
    assert average_gradient_norms(grads) == pytest.approx(3.5)
    assert get_max_gradient(grads) == pytest.approx(4.0)
    assert get_max_gradient_norm(grads) == pytest.approx(5.0)


def test_log_gradient_norms(grads):
    logged = {}

    class Writer:
        def add_scalar(self, tag, value, step):
            logged[tag] = (value, step)

    log_gradient_norms(grads, Writer(), i=7)
    assert logged["gradients/norm/encoder/w"] == (pytest.approx(5.0), 7)
    assert logged["gradients/norm/decoder/w"] == (pytest.approx(2.0), 7)


def test_empty_grads():
    assert sum_gradient_norms({}) == 0.0
    assert get_max_gradient({}) == 0.0
    assert get_max_gradient_norm({}) == 0.0


def test_plot_magnitude_saves(tmp_path, rng):
    from timbre_trap_tpu.utils.visualization import plot_magnitude

    mag = rng.uniform(size=(30, 50))
    out = str(tmp_path / "mag.png")
    fig = plot_magnitude(mag, extent=[0, 1, 20, 80], colorbar=True,
                         save_path=out)
    assert fig is not None
    import os

    assert os.path.getsize(out) > 0


def test_plot_latents_saves(tmp_path, rng):
    from timbre_trap_tpu.utils.visualization import plot_latents

    latents = rng.standard_normal((12, 8)).astype(np.float32)
    labels = ["violin"] * 6 + ["cello"] * 6
    out = str(tmp_path / "latents.pdf")
    plot_latents(latents, labels, save_path=out)
    import os

    assert os.path.getsize(out) > 0


def test_device_prefetch_orders_and_propagates(rng):
    from timbre_trap_tpu.data import device_prefetch

    batches = [{"x": np.full((2, 2), i)} for i in range(5)]
    seen = list(device_prefetch(iter(batches),
                                transfer=lambda b: b["x"] * 2, depth=2))
    assert [int(s[0, 0]) for s in seen] == [0, 2, 4, 6, 8]

    def boom():
        yield batches[0]
        raise RuntimeError("loader died")

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="loader died"):
        list(device_prefetch(boom(), transfer=lambda b: b))


def test_device_prefetch_slow_consumer_terminates():
    """A consumer slower than the producer must still see the sentinel:
    with the queue full at exhaustion the worker must keep offering it
    (regression: a dropped put_nowait left the consumer waiting forever)."""
    import time

    from timbre_trap_tpu.data import device_prefetch

    gen = device_prefetch(iter(range(6)), depth=2)
    seen = []
    for item in gen:
        time.sleep(0.05)  # producer finishes + fills the queue meanwhile
        seen.append(item)
    assert seen == list(range(6))


def test_device_prefetch_close_stops_worker():
    """Closing mid-iteration (early stop) unblocks and stops the worker."""
    import threading

    from timbre_trap_tpu.data import device_prefetch

    n_before = threading.active_count()
    gen = device_prefetch(iter(range(100)), depth=2)
    assert next(gen) == 0
    gen.close()
    for _ in range(50):
        if threading.active_count() <= n_before:
            break
        import time

        time.sleep(0.1)
    assert threading.active_count() <= n_before


def test_profiler_trace_writes(tmp_path):
    import jax.numpy as jnp

    from timbre_trap_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path)):
        with annotate("toy-op"):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    import os

    # a plugins/profile/<run>/ directory with trace artifacts must exist
    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "no trace artifacts written"
