import pytest

import numpy as np

from levelgan.config import EMPTY, GOAL, START, WALL, Config
from levelgan.data import LevelDataset, synthetic_corpus


def test_corpus_shape_and_determinism():
    a = synthetic_corpus(8, 16, seed=42)
    b = synthetic_corpus(8, 16, seed=42)
    assert a.shape == (8, 16, 16) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    c = synthetic_corpus(8, 16, seed=43)
    assert not np.array_equal(a, c)


def test_corpus_structure():
    levels = synthetic_corpus(32, 16, seed=0)
    for lv in levels:
        # border is wall
        assert (lv[0] == WALL).all() and (lv[-1] == WALL).all()
        assert (lv[:, 0] == WALL).all() and (lv[:, -1] == WALL).all()
        # exactly one start and one goal
        assert (lv == START).sum() == 1
        assert (lv == GOAL).sum() == 1
        # has some floor
        assert (lv == EMPTY).sum() > 10


def test_goal_reachable():
    """Random-walk carving guarantees start-goal connectivity."""
    from collections import deque
    levels = synthetic_corpus(16, 16, seed=7)
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


def test_corpus_feature_diversity():
    """Per-level density spread: the conditional model needs variance in
    the conditioning features across the corpus."""
    levels = synthetic_corpus(256, 16, seed=11)
    wall_frac = (levels == WALL).mean(axis=(1, 2))
    assert wall_frac.std() > 0.04
    assert wall_frac.max() - wall_frac.min() > 0.15


@pytest.mark.slow
def test_dataset_sampler():
    cfg = Config()
    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=5)
    b1 = ds.sample(64)
    assert b1.shape == (64, 16, 16) and b1.dtype == np.uint8
    ds2 = LevelDataset.from_config(cfg.data, cfg.model, seed=5)
    np.testing.assert_array_equal(b1, ds2.sample(64))  # deterministic
    hist = ds.tile_histogram(8)
    assert hist.sum() == ds.levels.size and hist.shape == (8,)


def test_from_config_rejects_out_of_range_corpus(tmp_path):
    """Tile ids >= n_tiles (or wrapping dtypes) must fail loudly, not
    corrupt training via uint8 wraparound / oversized KL histograms."""
    import pytest

    from levelgan.config import preset

    cfg = preset("toy_dcgan_16")
    for bad in (np.full((4, 16, 16), 300, np.int32),       # > 255 wraps
                np.full((4, 16, 16), -1, np.int32),        # < 0 wraps
                np.zeros((4, 16, 16), np.float32)):        # float ids
        path = str(tmp_path / "bad.npz")
        np.savez(path, levels=bad)
        with pytest.raises(ValueError, match="tile ids must be integer"):
            LevelDataset.from_config(
                cfg.data.__class__(**{**cfg.data.__dict__, "corpus": path}),
                cfg.model)

    bad8 = np.full((4, 16, 16), cfg.model.n_tiles, np.uint8)
    path8 = str(tmp_path / "bad8.npz")
    np.savez(path8, levels=bad8)
    with pytest.raises(ValueError, match="n_tiles"):
        LevelDataset.from_config(
            cfg.data.__class__(**{**cfg.data.__dict__, "corpus": path8}),
            cfg.model)


def test_carve_degenerate_size_has_start_and_goal():
    """1-cell interiors (size 3) must still contain exactly one START and
    one GOAL (env/features rely on the invariant)."""
    from levelgan.data.dataset import GOAL, START, _carve_level

    for seed in range(20):
        rng = np.random.default_rng(seed)
        g = _carve_level(rng, 3, wall_density=0.25, hazard_rate=0.0,
                         coin_rate=0.0)
        assert (g == START).sum() == 1, g
        assert (g == GOAL).sum() == 1, g


def test_rate_oversample_widens_high_rate_tail():
    """rate_oversample draws a fraction of levels from the top quartile of
    the hazard/coin rate band; 0.0 leaves the corpus bit-identical."""
    from levelgan.data.dataset import synthetic_corpus
    from levelgan.config import HAZARD, COIN

    base = synthetic_corpus(512, 16, seed=9)
    same = synthetic_corpus(512, 16, seed=9, rate_oversample=0.0)
    assert np.array_equal(base, same)
    over = synthetic_corpus(512, 16, seed=9, rate_oversample=0.5)
    for tile in (HAZARD, COIN):
        f_base = (base == tile).mean()
        f_over = (over == tile).mean()
        assert f_over > f_base * 1.15, (tile, f_base, f_over)
