"""Test configuration: force a virtual 8-device CPU platform.

Must run before the first `import jax` anywhere in the test session so that
multi-chip sharding tests get a fake 8-device mesh (the fake-backend story
the reference lacks — it has no tests at all; see SURVEY.md §4).
"""

import os

# Force-override: the driver environment pins JAX_PLATFORMS=axon (one real
# TPU chip) via a sitecustomize PJRT registration that ignores the env var;
# unit tests must run on the virtual multi-device CPU platform, so override
# through the jax config (effective as long as no backend is initialized yet).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles many distinct CPU graphs;
# re-runs (e.g. the driver's green-check) hit the cache and finish much faster.
jax.config.update("jax_compilation_cache_dir", "/tmp/tt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_cqt():
    """A scaled-down CQT configuration for fast unit tests."""
    from timbre_trap_tpu.transform import CQT

    return CQT(n_octaves=5, bins_per_octave=12, sample_rate=8000, secs_per_block=0.5)


@pytest.fixture(scope="session")
def default_cqt():
    """The flagship configuration (22.05 kHz, 9 octaves x 60 bins, 3 s blocks)."""
    from timbre_trap_tpu.transform import CQT

    return CQT(n_octaves=9, bins_per_octave=60, sample_rate=22050, secs_per_block=3)
