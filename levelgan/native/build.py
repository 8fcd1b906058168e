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
_lock = threading.Lock()
_libs: dict = {}
_build_errors: dict = {}


def _compile(src: str, so: str) -> str | None:
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True, timeout=120)
            return None
        except FileNotFoundError:
            continue
        except subprocess.CalledProcessError as e:
            return e.stderr.decode(errors="replace")[:500]
        except subprocess.TimeoutExpired:
            return "compiler timeout"
    return "no C compiler found"


def _load_lib(stem: str, bind) -> "ctypes.CDLL | None":
    """Build (if stale) + load + bind ``<stem>.c`` -> ``_<stem>.so``."""
    src = os.path.join(_DIR, f"{stem}.c")
    so = os.path.join(_DIR, f"_{stem}.so")
    with _lock:
        if stem in _libs or stem in _build_errors:
            return _libs.get(stem)
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            err = _compile(src, so)
            if err is not None:
                _build_errors[stem] = err
                return None
        try:
            lib = ctypes.CDLL(so)
            bind(lib)
            _libs[stem] = lib
        except OSError as e:
            _build_errors[stem] = str(e)
        return _libs.get(stem)


def _bind_corpusgen(lib):
    lib.gen_levels.argtypes = [
        ctypes.c_uint64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.gen_levels.restype = ctypes.c_int


def _bind_unpack(lib):
    lib.unpack_planes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.unpack_planes.restype = ctypes.c_int


def _load():
    return _load_lib("corpusgen", _bind_corpusgen)


def native_available() -> bool:
    return _load() is not None


def unpack_native_available() -> bool:
    return _load_lib("unpack", _bind_unpack) is not None


def unpack_planes_native(packed: np.ndarray, bits: int,
                         out: np.ndarray) -> None:
    """Single-pass C unpack of the bit-plane wire format.

    ``packed``: C-contiguous uint8 with n_groups*bits total bytes in the
    [group, plane] layout; ``out``: C-contiguous uint8 view of n_groups*8
    bytes (one tile id per byte).  Raises RuntimeError when the native
    library is unavailable — callers keep the NumPy path as fallback.
    """
    lib = _load_lib("unpack", _bind_unpack)
    if lib is None:
        raise RuntimeError(
            f"native unpack unavailable: {_build_errors.get('unpack')}")
    assert packed.flags.c_contiguous and out.flags.c_contiguous
    n_groups = packed.size // bits
    assert out.size == n_groups * 8, (out.size, n_groups)
    rc = lib.unpack_planes(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_groups, bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"unpack_planes failed with code {rc}")


def synthetic_corpus_native(n: int, size: int, seed: int = 1234,
                            wall_density: float = 0.25,
                            hazard_rate: float = 0.04,
                            coin_rate: float = 0.06,
                            rate_oversample: float = 0.0) -> np.ndarray:
    """Native twin of data.dataset.synthetic_corpus (own RNG stream —
    deterministic in the seed, but a distinct backend from the NumPy path).
    Raises RuntimeError if the native library is unavailable."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native corpusgen unavailable: {_build_error}")
    out = np.empty((n, size, size), np.uint8)
    rc = lib.gen_levels(
        ctypes.c_uint64(seed), n, size, wall_density, hazard_rate, coin_rate,
        rate_oversample,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise RuntimeError(f"gen_levels failed with code {rc}")
    return out
