"""Real-TPU kernel test tier (SURVEY.md §4.2 "single-chip TPU job";
VERDICT.md round-1 item 2).

Unlike tests/conftest.py this does NOT force the CPU backend: Pallas
kernels compile through Mosaic to real TPU machine code here, catching the
bug classes interpret mode cannot (VMEM exhaustion, layout/relayout
rejections, tiling faults).

Run explicitly (the chip is single-tenant — do not run concurrently with
another TPU process):

    python -m pytest tests_tpu -q

Wired into the bench workflow via tools/bench_all.py --tpu-tests.
"""

import jax
import pytest


@pytest.fixture(scope="session", autouse=True)
def require_tpu():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"real-TPU tier requires a TPU backend, got "
                    f"{jax.default_backend()}", allow_module_level=True)
