"""Test harness setup: force the CPU backend with 8 fake devices.

This is the SURVEY.md §4.2 fake-mesh trick. NOTE: this environment's axon
sitecustomize imports jax at interpreter startup with JAX_PLATFORMS=axon
latched, so env vars set here are too late — ``jax.config.update`` is the
only thing that works (and it must run before any backend is initialized,
i.e. before any jax computation).
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
