"""Level corpus: deterministic synthetic generator + batched sampler.

Reference equivalent: the reference trains on its own generated/recorded
levels; it ships no dataset (SURVEY.md N3).  The synthetic corpus here is the
shared test/train fixture mandated by SURVEY.md §4.2: a seeded random-walk
("drunkard's walk") carver that produces *structured, playable-by-construction*
tile levels — border walls, a connected carved interior, exactly one START and
one GOAL, hazards/coins/terrain sprinkled on floor cells.

Corpus generation is offline host NumPy (runs once); the hot path only ever
sees the resulting uint8 array.  Per-step batches are raw uint8 tile ids —
one-hot encoding and augmentation happen on-device inside the train step
(BASELINE.json north_star).
"""

from __future__ import annotations

import numpy as np

from levelgan.config import COIN, EMPTY, GOAL, HAZARD, START, WALL

SAND, ICE = 6, 7


def _carve_level(rng: np.random.Generator, size: int, wall_density: float,
                 hazard_rate: float, coin_rate: float) -> np.ndarray:
    """One level via random-walk carving. Returns uint8 [size, size]."""
    grid = np.full((size, size), WALL, dtype=np.uint8)
    interior = size - 2

    # Carve a connected floor region with a drunkard's walk.
    target_floor = max(4, int(round(interior * interior * (1.0 - wall_density))))
    r, c = rng.integers(1, size - 1, size=2)
    start_pos = (int(r), int(c))
    grid[r, c] = EMPTY
    carved = [(int(r), int(c))]
    steps = 0
    max_steps = 50 * interior * interior
    while len(carved) < target_floor and steps < max_steps:
        dr, dc = [(0, 1), (0, -1), (1, 0), (-1, 0)][rng.integers(0, 4)]
        nr, nc = r + dr, c + dc
        if 1 <= nr < size - 1 and 1 <= nc < size - 1:
            r, c = nr, nc
            if grid[r, c] == WALL:
                grid[r, c] = EMPTY
                carved.append((int(r), int(c)))
        steps += 1

    # Goal: the carved cell farthest (L1) from the start; guaranteed reachable.
    dists = [abs(p[0] - start_pos[0]) + abs(p[1] - start_pos[1]) for p in carved]
    goal_pos = carved[int(np.argmax(dists))]
    if goal_pos == start_pos:
        if len(carved) > 1:
            goal_pos = carved[-1]
        else:
            # Degenerate 1-cell carve (tiny sizes): force a distinct GOAL
            # cell so the "exactly one START and one GOAL" invariant the
            # env/features rely on still holds.
            r0, c0 = start_pos
            goal_pos = (r0, c0 + 1) if c0 + 1 < size else (r0, c0 - 1)
            grid[goal_pos] = EMPTY

    # Decorations on floor cells (never on start/goal).
    floor = [p for p in carved if p != start_pos and p != goal_pos]
    if floor:
        probs = rng.random(len(floor))
        terrain = rng.random(len(floor))
        for (p, u, t) in zip(floor, probs, terrain):
            if u < hazard_rate:
                grid[p] = HAZARD
            elif u < hazard_rate + coin_rate:
                grid[p] = COIN
            elif t < 0.08:
                grid[p] = SAND
            elif t < 0.16:
                grid[p] = ICE

    grid[start_pos] = START
    grid[goal_pos] = GOAL
    return grid


def synthetic_corpus(n: int, size: int, seed: int = 1234,
                     wall_density: float = 0.25, hazard_rate: float = 0.04,
                     coin_rate: float = 0.06,
                     rate_oversample: float = 0.0) -> np.ndarray:
    """Deterministic corpus of ``n`` uint8 levels [n, size, size].

    The density knobs are CENTERS: each level draws its own wall density /
    hazard rate / coin rate around them, so the corpus spans a range of
    feature values — without this spread the conditional model (config 4)
    would have no conditioning signal to learn (cond features would be
    ~constant across the corpus).

    ``rate_oversample`` (round 5, VERDICT r4 item 7): fraction of levels
    whose hazard/coin rate multipliers draw from the TOP quartile of the
    [0, 2] band instead of the whole band — the conditional family's
    measured response clamps at its achievable edge on those dims
    (calibrated slopes hazard 0.62 / coin 0.83) partly because high-rate
    levels are rare corpus events; oversampling the upper quantiles gives
    the model the requests it is asked to realize.  0.0 draws NOTHING
    extra from the RNG, so existing corpora stay bit-identical.
    """
    rng = np.random.default_rng(seed)
    levels = []
    for _ in range(n):
        wd = np.clip(rng.uniform(0.6, 1.6) * wall_density, 0.05, 0.55)
        if rate_oversample and rng.random() < rate_oversample:
            hr = rng.uniform(1.5, 2.0) * hazard_rate
            cr = rng.uniform(1.5, 2.0) * coin_rate
        else:
            hr = rng.uniform(0.0, 2.0) * hazard_rate
            cr = rng.uniform(0.0, 2.0) * coin_rate
        levels.append(_carve_level(rng, size, wd, hr, cr))
    return np.stack(levels)


class LevelDataset:
    """Infinite shuffled batch sampler over a uint8 level corpus.

    ``batches(global_batch)`` yields host uint8 arrays; sharding onto the
    device mesh is the trainer's job (levelgan.dist).  Deterministic given
    the seed — required by the §4.2 determinism tests.
    """

    def __init__(self, levels: np.ndarray, seed: int = 0):
        if levels.dtype != np.uint8 or levels.ndim != 3:
            raise ValueError(f"expected uint8 [N,H,W], got {levels.dtype} {levels.shape}")
        self.levels = levels
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    @classmethod
    def from_config(cls, data_cfg, model_cfg, seed: int = 0) -> "LevelDataset":
        if data_cfg.corpus in ("synthetic", "synthetic_native"):
            gen = synthetic_corpus
            if data_cfg.corpus == "synthetic_native":
                from levelgan.native import native_available, \
                    synthetic_corpus_native
                if native_available():
                    gen = synthetic_corpus_native
                else:
                    print("[levelgan] native corpusgen unavailable; "
                          "falling back to NumPy synthetic corpus")
            levels = gen(
                data_cfg.corpus_size, model_cfg.level_size,
                seed=data_cfg.corpus_seed, wall_density=data_cfg.wall_density,
                hazard_rate=data_cfg.hazard_rate, coin_rate=data_cfg.coin_rate,
                rate_oversample=data_cfg.rate_oversample)
        else:
            levels = np.load(data_cfg.corpus)
            if isinstance(levels, np.lib.npyio.NpzFile):
                levels = levels["levels"]
            if np.issubdtype(levels.dtype, np.floating) or (
                    levels.size and (int(levels.min()) < 0
                                     or int(levels.max()) > 255)):
                rng_txt = (f"range [{levels.min()}, {levels.max()}]"
                           if levels.size else "empty")
                raise ValueError(
                    f"corpus {data_cfg.corpus} has dtype {levels.dtype} / "
                    f"{rng_txt}: tile ids must be integer in [0, 255] "
                    "(astype would silently wrap out-of-range values)")
            levels = levels.astype(np.uint8)
        # A corpus tile id >= n_tiles would make the KL reference histogram
        # longer than every per-step gen_hist metric (broadcast error deep
        # in api.train) or silently one-hot to all-zero rows — fail loudly.
        hi = int(levels.max()) if levels.size else 0
        if hi >= model_cfg.n_tiles:
            raise ValueError(
                f"corpus contains tile id {hi} but model.n_tiles="
                f"{model_cfg.n_tiles}; raise n_tiles or fix the corpus")
        return cls(levels, seed=seed)

    def sample(self, batch_size: int) -> np.ndarray:
        idx = self._rng.integers(0, len(self.levels), size=batch_size)
        return self.levels[idx]

    def sample_at(self, step: int, batch_size: int) -> np.ndarray:
        """Stateless draw for train step ``step``: depends only on
        (seed, step), so a resumed run consumes exactly the batches an
        uninterrupted run would (fault-recovery equivalence, SURVEY.md §5.3)."""
        rng = np.random.default_rng((self._seed, step))
        idx = rng.integers(0, len(self.levels), size=batch_size)
        return self.levels[idx]

    def batches(self, batch_size: int):
        while True:
            yield self.sample(batch_size)

    def tile_histogram(self, n_tiles: int) -> np.ndarray:
        """Tile-type marginal counts over the whole corpus (KL reference)."""
        return np.bincount(self.levels.reshape(-1), minlength=n_tiles).astype(np.float64)
