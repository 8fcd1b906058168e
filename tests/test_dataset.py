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


def test_dataset_sampler():
    cfg = Config()
    ds = LevelDataset.from_config(cfg.data, cfg.model, seed=5)
    b1 = ds.sample(64)
    assert b1.shape == (64, 16, 16) and b1.dtype == np.uint8
    ds2 = LevelDataset.from_config(cfg.data, cfg.model, seed=5)
    np.testing.assert_array_equal(b1, ds2.sample(64))  # deterministic
    hist = ds.tile_histogram(8)
    assert hist.sum() == ds.levels.size and hist.shape == (8,)
