"""Persistent XLA compilation cache for every framework entrypoint.

The dev relay's compile path has pathological days (observed: 600s for a
program that normally compiles in ~20s — tools/bench_all round-2 notes),
and on a TPU pod every host recompiles the same programs after any
restart.  A repo-local persistent cache makes warm starts hit disk in
seconds; results are unaffected (the cache keys on the exact HLO +
backend + compile options).

Reference equivalent: none (eager PyTorch has no compile step).  Called
by the train/export CLIs and the bench/validate tools; library users who
construct programs directly can call :func:`enable` themselves.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``
    (default: ``<repo>/.xla_cache``).  Idempotent; returns the dir."""
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".xla_cache")
    os.makedirs(cache_dir, exist_ok=True)
    if jax.config.jax_compilation_cache_dir not in (None, cache_dir):
        # jax's cache object is a singleton latched on first compile;
        # re-pointing the config alone is silently ignored after that
        # (found by the order-dependent test_compile_cache failure) —
        # reset so a user-specified io.compile_cache actually takes
        # effect in a process that already compiled something
        try:
            from jax._src.compilation_cache import reset_cache
            reset_cache()
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
