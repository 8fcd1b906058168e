"""Build + ctypes binding for the native corpus generator.

Compiles ``corpusgen.c`` with the system C compiler on first use (cached
next to the source; rebuilt when the source is newer) and binds it via
ctypes — no pybind11 in this image (see the repo build notes).  Everything
degrades gracefully: if no compiler is available the callers fall back to
the NumPy implementation.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "corpusgen.c")
_SO = os.path.join(_DIR, "_corpusgen.so")
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _compile() -> str | None:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True, timeout=120)
            return None
        except FileNotFoundError:
            continue
        except subprocess.CalledProcessError as e:
            return e.stderr.decode(errors="replace")[:500]
        except subprocess.TimeoutExpired:
            return "compiler timeout"
    return "no C compiler found"


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build_error = _compile()
            if _build_error is not None:
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.gen_levels.argtypes = [
                ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.gen_levels.restype = ctypes.c_int
            _lib = lib
        except OSError as e:
            _build_error = str(e)
        return _lib


def native_available() -> bool:
    return _load() is not None


def synthetic_corpus_native(n: int, size: int, seed: int = 1234,
                            wall_density: float = 0.25,
                            hazard_rate: float = 0.04,
                            coin_rate: float = 0.06) -> np.ndarray:
    """Native twin of data.dataset.synthetic_corpus (own RNG stream —
    deterministic in the seed, but a distinct backend from the NumPy path).
    Raises RuntimeError if the native library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native corpusgen unavailable: {_build_error}")
    out = np.empty((n, size, size), np.uint8)
    rc = lib.gen_levels(
        ctypes.c_uint64(seed), n, size, wall_density, hazard_rate, coin_rate,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"gen_levels failed with code {rc}")
    return out
