"""Native corpus generator: structural invariants + determinism + speed."""

import numpy as np
import pytest

from levelgan.config import EMPTY, GOAL, START, WALL
from levelgan.native import native_available, synthetic_corpus_native

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C compiler in this environment")


def test_determinism_and_shape():
    a = synthetic_corpus_native(16, 16, seed=7)
    b = synthetic_corpus_native(16, 16, seed=7)
    assert a.shape == (16, 16, 16) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, synthetic_corpus_native(16, 16, seed=8))


def test_structure_matches_numpy_invariants():
    levels = synthetic_corpus_native(32, 16, seed=0)
    for lv in levels:
        assert (lv[0] == WALL).all() and (lv[-1] == WALL).all()
        assert (lv[:, 0] == WALL).all() and (lv[:, -1] == WALL).all()
        assert (lv == START).sum() == 1
        assert (lv == GOAL).sum() == 1
        assert (lv == EMPTY).sum() > 10


def test_goal_reachable():
    from collections import deque
    levels = synthetic_corpus_native(16, 16, seed=3)
    for lv in levels:
        start = tuple(np.argwhere(lv == START)[0])
        goal = tuple(np.argwhere(lv == GOAL)[0])
        seen, q = {start}, deque([start])
        while q:
            r, c = q.popleft()
            for nr, nc in ((r+1, c), (r-1, c), (r, c+1), (r, c-1)):
                if (0 <= nr < 16 and 0 <= nc < 16 and (nr, nc) not in seen
                        and lv[nr, nc] != WALL):
                    seen.add((nr, nc))
                    q.append((nr, nc))
        assert goal in seen


def test_tile_marginals_close_to_numpy_backend():
    """Different RNG stream, same process: tile marginals should agree."""
    from levelgan.data.dataset import synthetic_corpus

    nat = synthetic_corpus_native(512, 16, seed=1)
    ref = synthetic_corpus(512, 16, seed=2)
    h_nat = np.bincount(nat.reshape(-1), minlength=8) / nat.size
    h_ref = np.bincount(ref.reshape(-1), minlength=8) / ref.size
    np.testing.assert_allclose(h_nat, h_ref, atol=0.02)


def test_dataset_uses_native_backend(capsys):
    from levelgan.config import Config
    from levelgan.data.dataset import LevelDataset

    cfg = Config().override(**{"data.corpus": "synthetic_native",
                               "data.corpus_size": 8})
    ds = LevelDataset.from_config(cfg.data, cfg.model)
    assert ds.levels.shape == (8, 16, 16)


def test_native_speedup():
    """The point of the C tier: meaningfully faster than the Python loop."""
    import time

    from levelgan.data.dataset import synthetic_corpus

    n, size = 512, 16
    t0 = time.perf_counter()
    synthetic_corpus_native(n, size, seed=0)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    synthetic_corpus(n, size, seed=0)
    t_py = time.perf_counter() - t0
    assert t_native < t_py / 5, (t_native, t_py)


def test_native_unpack_parity():
    """C unpack == NumPy unpack on random packed buffers, all plane widths,
    including the streaming out=-slice form."""
    import numpy as np

    from levelgan.api import unpack_levels
    from levelgan.native import unpack_native_available, unpack_planes_native

    if not unpack_native_available():
        import pytest
        pytest.skip("no C compiler for the native tier")

    rng = np.random.default_rng(0)
    for bits in (1, 2, 3, 4, 7, 8):
        for size in (16, 64):
            hw = size * size
            packed = rng.integers(
                0, 256, size=(5, hw * bits // 8), dtype=np.uint8)
            # NumPy oracle: force the fallback by calling the plane loop on
            # a Fortran-ordered copy (non-contiguous -> numpy path)
            ref = unpack_levels(np.asfortranarray(packed), size)
            got = unpack_levels(packed, size)
            np.testing.assert_array_equal(got, ref)
            # streaming slice form
            big = np.full((7, size, size), 0xAB, np.uint8)
            unpack_levels(packed, size, out=big[1:6])
            np.testing.assert_array_equal(big[1:6], ref)
            # direct native call parity too (exercises the binding)
            out2 = np.empty((5, hw), np.uint8)
            unpack_planes_native(packed, bits, out2)
            np.testing.assert_array_equal(out2.reshape(5, size, size), ref)


def test_native_rate_oversample():
    if not native_available():
        import pytest
        pytest.skip("no C compiler")
    from levelgan.config import COIN, HAZARD

    base = synthetic_corpus_native(512, 16, seed=9)
    assert np.array_equal(base,
                          synthetic_corpus_native(512, 16, seed=9,
                                                  rate_oversample=0.0))
    over = synthetic_corpus_native(512, 16, seed=9, rate_oversample=0.5)
    for tile in (HAZARD, COIN):
        assert (over == tile).mean() > (base == tile).mean() * 1.15
