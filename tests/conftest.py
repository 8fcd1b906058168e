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

# Persistent XLA compile cache for the suite: the fast tier is dominated by
# CPU jit compiles of the step programs (~7 min cold on this 1-core host);
# with the cache, repeat runs hit disk. Keyed on exact HLO + backend, so
# correctness is unaffected; .xla_cache is gitignored.
from levelgan.xla_cache import enable as _enable_xla_cache

_enable_xla_cache()


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 fake CPU devices, got {len(devs)}"
    return devs
