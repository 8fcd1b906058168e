"""Quality-metric tier: on-device solvability (env/solver.py) + diversity
metrics (lio/quality.py).  The synthetic corpus is playable BY CONSTRUCTION
(data/dataset.py drunkard's-walk carver), so the solver has a ground-truth
fixture: corpus solvable_frac must be exactly 1.0."""

import numpy as np
import pytest

from levelgan.config import EMPTY, GOAL, START, WALL
from levelgan.data.dataset import synthetic_corpus
from levelgan.env.solver import reachable, solvable
from levelgan.lio.quality import (mean_pairwise_hamming, quality_report,
                                  tile_entropy, unique_fraction)


def _room(size=8):
    """Border-walled open room, no start/goal yet."""
    g = np.full((size, size), WALL, np.uint8)
    g[1:-1, 1:-1] = EMPTY
    return g


def test_open_room_is_solvable():
    g = _room()
    g[1, 1] = START
    g[6, 6] = GOAL
    assert bool(solvable(g[None])[0])


def test_walled_off_goal_is_unsolvable():
    g = _room()
    g[1, 1] = START
    # enclose the goal corner completely
    g[5, 5:7] = WALL
    g[5:7, 5] = WALL
    g[6, 6] = GOAL
    assert not bool(solvable(g[None])[0])


def test_no_goal_is_unsolvable():
    g = _room()
    g[1, 1] = START
    assert not bool(solvable(g[None])[0])


def test_center_fallback_start():
    # no START tile -> agent starts at the grid center (env.sim rule)
    g = _room()
    g[6, 6] = GOAL
    assert bool(solvable(g[None])[0])


def test_flood_fill_does_not_wrap_edges():
    # full-height wall column splits the room; goal on the far side.  A
    # roll-based (wrapping) shift would tunnel across the border and pass.
    g = _room()
    g[1, 1] = START
    g[:, 4] = WALL
    g[6, 6] = GOAL
    assert not bool(solvable(g[None])[0])
    # sanity: removing one wall cell reconnects
    g2 = g.copy()
    g2[3, 4] = EMPTY
    assert bool(solvable(g2[None])[0])


def test_reachable_respects_start_on_wall():
    # degenerate level: center (fallback start) is a wall -> nothing reached
    g = np.full((8, 8), WALL, np.uint8)
    g[1, 1] = GOAL
    r = reachable(g[None])
    assert not bool(r.any())
    assert not bool(solvable(g[None])[0])


def test_corpus_is_solvable_by_construction():
    levels = synthetic_corpus(32, 16, seed=7)
    sol = np.asarray(solvable(levels))
    assert sol.all(), f"corpus should be playable by construction: {sol}"
    rep = quality_report(levels, 8, sample=32)
    assert rep["solvable_frac"] == 1.0
    assert rep["one_start_frac"] == 1.0
    assert rep["one_goal_frac"] == 1.0


def test_unique_fraction_counts_duplicates():
    levels = synthetic_corpus(8, 16, seed=3)
    dup = np.concatenate([levels, levels[:4]])
    assert unique_fraction(levels) == 1.0
    assert unique_fraction(dup) == pytest.approx(8 / 12)


def test_pairwise_hamming_bounds():
    a = np.zeros((4, 8, 8), np.uint8)
    assert mean_pairwise_hamming(a, 8, sample=4) == pytest.approx(0.0)
    # two level types differing everywhere: mean over ordered distinct pairs
    # = (# cross pairs) * 1.0 / (k*(k-1)) = (2*2*2) / (4*3)
    b = a.copy()
    b[2:] = 1
    assert mean_pairwise_hamming(b, 8, sample=4) == pytest.approx(8 / 12)


def test_tile_entropy_bounds():
    flat = np.zeros((2, 4, 4), np.uint8)
    assert tile_entropy(flat, 8) == pytest.approx(0.0)
    uniform = np.arange(8, dtype=np.uint8).reshape(1, 2, 4).repeat(2, axis=0)
    assert tile_entropy(uniform, 8) == pytest.approx(np.log(8))


def test_repair_places_missing_start_and_goal():
    from levelgan.ops.repair import ensure_start_goal

    rng = np.random.default_rng(0)
    ids = np.full((3, 6, 6), EMPTY, np.uint8)
    logits = rng.normal(size=(3, 6, 6, 8)).astype(np.float32)
    # level 0: lacks both; make the model "most confident" at fixed cells
    logits[0, 2, 3, START] = 10.0
    logits[0, 4, 1, GOAL] = 10.0
    # level 1: already has both -> untouched
    ids[1, 1, 1] = START
    ids[1, 4, 4] = GOAL
    # level 2: START/GOAL confidence peaks on the SAME cell -> GOAL must
    # yield (never overwrite the placed START)
    logits[2, 3, 3, START] = 10.0
    logits[2, 3, 3, GOAL] = 10.0

    out = np.asarray(ensure_start_goal(ids, logits))
    assert out[0, 2, 3] == START and out[0, 4, 1] == GOAL
    assert (out[1] == ids[1]).all()
    assert out[2, 3, 3] == START
    assert (out[2] == GOAL).sum() == 1 and (out[2] == START).sum() == 1
    # repair is idempotent and total: every level well-formed
    for lv in out:
        assert (lv == START).any() and (lv == GOAL).any()
    again = np.asarray(ensure_start_goal(out, logits))
    assert (again == out).all()


def test_repair_places_goal_connected_to_start():
    """GOAL placement is constrained to START's reachable component, so a
    repaired level is solvable even when the raw confidence peaks in a
    disconnected chamber."""
    from levelgan.ops.repair import ensure_start_goal

    g = _room(8)                      # two chambers split by a wall column
    g[:, 4] = WALL
    ids = g[None]
    logits = np.zeros((1, 8, 8, 8), np.float32)
    logits[0, 2, 2, START] = 10.0     # left chamber
    logits[0, 2, 6, GOAL] = 10.0      # right chamber (unreachable)
    logits[0, 5, 1, GOAL] = 5.0       # best reachable goal cell
    out = np.asarray(ensure_start_goal(ids, logits))
    assert out[0, 2, 2] == START
    assert out[0, 2, 6] != GOAL       # confidence peak rejected: disconnected
    assert out[0, 5, 1] == GOAL
    assert bool(solvable(out)[0])

    # walls are never chosen for START even at max confidence
    logits2 = np.zeros((1, 8, 8, 8), np.float32)
    logits2[0, 0, 0, START] = 50.0    # border wall
    logits2[0, 3, 3, START] = 1.0
    out2 = np.asarray(ensure_start_goal(g[None], logits2))
    assert out2[0, 0, 0] == WALL and out2[0, 3, 3] == START


def test_repair_exactly_one_dedups_duplicates():
    """exactly_one=True (round 5): duplicate START/GOAL tiles are demoted
    to the model's next-best non-structural non-WALL tile, keeping exactly
    one of each — and keeping a REACHABLE GOAL when one exists."""
    from levelgan.ops.repair import ensure_start_goal

    g = _room(8)
    g[:, 4] = WALL                     # two chambers
    g[2, 2] = START                    # left chamber
    g[5, 1] = START                    # duplicate START (left chamber)
    g[5, 2] = GOAL                     # reachable GOAL
    g[2, 6] = GOAL                     # unreachable duplicate (right chamber)
    ids = g[None]
    logits = np.zeros((1, 8, 8, 8), np.float32)
    logits[..., EMPTY] = 1.0           # next-best everywhere = EMPTY
    # confidence prefers the (2,2) START
    logits[0, 2, 2, START] = 10.0
    logits[0, 2, 6, GOAL] = 10.0       # model loves the unreachable GOAL...

    out = np.asarray(ensure_start_goal(ids, logits, exactly_one=True))
    assert (out == START).sum() == 1 and out[0, 2, 2] == START
    assert out[0, 5, 1] == EMPTY       # demoted to next-best
    # ...but dedup keeps the REACHABLE goal regardless of confidence
    assert (out == GOAL).sum() == 1 and out[0, 5, 2] == GOAL
    assert out[0, 2, 6] == EMPTY
    assert bool(solvable(out)[0])
    # idempotent, and a no-op on already-exactly-one levels
    again = np.asarray(ensure_start_goal(out, logits, exactly_one=True))
    assert (again == out).all()


def test_repair_exactly_one_replacement_never_structural_or_wall():
    """Even when the model's top non-START channel at a duplicate cell is
    WALL (which could sever the kept START->GOAL path), the replacement
    falls to the best non-WALL alternative."""
    from levelgan.ops.repair import ensure_start_goal

    g = _room(8)
    # corridor: START ... duplicate START on the only path ... GOAL
    g[1:7, 2] = WALL
    g[1:7, 5] = WALL
    g[3, 1] = START
    g[3, 3] = START                    # on the only corridor
    g[3, 6] = GOAL
    # carve the corridor row
    g[3, 2] = EMPTY
    g[3, 4] = EMPTY
    g[3, 5] = EMPTY
    ids = g[None]
    logits = np.zeros((1, 8, 8, 8), np.float32)
    logits[..., WALL] = 5.0            # model's next-best everywhere: WALL
    logits[..., EMPTY] = 1.0
    logits[0, 3, 1, START] = 10.0      # keep the corridor-end START

    out = np.asarray(ensure_start_goal(ids, logits, exactly_one=True))
    assert (out == START).sum() == 1 and out[0, 3, 1] == START
    assert out[0, 3, 3] == EMPTY       # NOT WALL
    assert bool(solvable(out)[0])      # path stayed open


def test_repair_exactly_one_composes_with_placement():
    """Levels missing a tile still get one placed; levels with duplicates
    get deduped — in the same call, under both placement laws."""
    from levelgan.ops.repair import ensure_start_goal
    import jax

    rng = np.random.default_rng(3)
    ids = np.stack([_room(8), _room(8)])
    ids[0, 2, 2] = START               # missing GOAL
    ids[1, 2, 2] = START
    ids[1, 3, 3] = START
    ids[1, 4, 4] = GOAL
    ids[1, 5, 5] = GOAL
    logits = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    for placement, key in (("confidence", None),
                           ("uniform", jax.random.key(0))):
        out = np.asarray(ensure_start_goal(
            ids, logits, key=key, placement=placement, exactly_one=True))
        assert ((out == START).sum(axis=(1, 2)) == 1).all()
        assert ((out == GOAL).sum(axis=(1, 2)) == 1).all()


@pytest.mark.slow
def test_training_quality_probe(tmp_path):
    """io.quality_every logs on-device playability scalars into
    metrics.jsonl at its own cadence."""
    import json

    from levelgan.api import train
    from levelgan.config import preset

    tiny = {
        "model.base_channels": 16, "model.critic_base_channels": 16,
        "model.latent_dim": 16, "model.group_size": 8,
        "train.batch_size": 8, "train.steps": 4, "data.corpus_size": 64,
        "train.steps_per_dispatch": 1,   # cadence fires per boundary crossing
        "io.log_every": 100, "io.ckpt_every": 100,
        "io.quality_every": 2, "io.quality_n": 8,
        "io.out_dir": str(tmp_path),
    }
    train(preset("toy_dcgan_16").override(**tiny), echo=False)
    recs = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    probes = [r for r in recs if "solvable_frac" in r]
    assert {r["step"] for r in probes} == {2, 4}
    for r in probes:
        assert 0.0 <= r["solvable_frac"] <= 1.0
        assert 0.0 <= r["has_goal_frac"] <= 1.0


def test_keep_best_checkpoint(tmp_path):
    """io.keep_best snapshots the best-probe checkpoint into ckpt_best
    (pruned to one), and it loads like any other checkpoint."""
    import os

    from levelgan.api import train
    from levelgan.cli.export import load_generator
    from levelgan.config import preset

    tiny = {
        "model.base_channels": 16, "model.critic_base_channels": 16,
        "model.latent_dim": 16, "model.group_size": 8,
        "train.batch_size": 8, "train.steps": 6, "data.corpus_size": 64,
        "train.steps_per_dispatch": 1,
        "io.log_every": 100, "io.ckpt_every": 100,
        "io.quality_every": 2, "io.quality_n": 8,
        "io.keep_best": True,
        "io.out_dir": str(tmp_path),
    }
    train(preset("toy_dcgan_16").override(**tiny), echo=False)
    best_dir = tmp_path / "ckpt_best"
    entries = sorted(os.listdir(best_dir))
    assert len(entries) == 1 and entries[0].startswith("step_")
    cfg, _state = load_generator(str(best_dir / entries[0]))
    assert cfg.io.keep_best is True


def test_keep_best_requires_quality_probe():
    from levelgan.config import preset
    with pytest.raises(ValueError, match="keep_best"):
        preset("toy_dcgan_16").override(**{"io.keep_best": True})


@pytest.mark.slow
def test_eval_quality_cli(tmp_path, capsys):
    import json

    from levelgan.api import train
    from levelgan.config import preset
    from tools.eval_quality import main

    tiny = {
        "model.base_channels": 16, "model.critic_base_channels": 16,
        "model.latent_dim": 16, "model.group_size": 8,
        "train.batch_size": 8, "train.steps": 2, "data.corpus_size": 64,
        "io.log_every": 100, "io.ckpt_every": 2,
        "io.out_dir": str(tmp_path),
    }
    res = train(preset("toy_dcgan_16").override(**tiny), echo=False)
    out = tmp_path / "quality.json"
    assert main(["--ckpt", res["checkpoint"], "--n", "32", "--sample", "16",
                 "--out", str(out)]) == 0
    rep = json.loads(out.read_text())
    assert set(rep) == {"preset", "repair", "generated", "corpus",
                        "solvable_gap"}
    assert rep["corpus"]["solvable_frac"] == 1.0
    g = rep["generated"]
    assert 0.0 <= g["solvable_frac"] <= 1.0
    assert 0.0 <= g["mean_pairwise_hamming"] <= 1.0

    # repaired export: every level must have >=1 START and >=1 GOAL
    assert main(["--ckpt", res["checkpoint"], "--n", "32", "--sample", "16",
                 "--repair", "--out", str(out)]) == 0
    rep = json.loads(out.read_text())
    assert rep["repair"] is True
    assert rep["generated"]["has_start_frac"] == 1.0
    assert rep["generated"]["has_goal_frac"] == 1.0


# ---- track family (levelgan/track/quality.py) -----------------------------

def test_track_corpus_is_drivable_by_construction():
    """The scripted driver laps 100% of corpus tracks; geometry metrics
    confirm the corpus invariants (closure, kappa/width bounds)."""
    from levelgan.track.data import synthetic_tracks
    from levelgan.track.quality import track_quality_report

    rep = track_quality_report(synthetic_tracks(64, 32, seed=5))
    assert rep["lap_frac"] == 1.0
    assert rep["closure_ok_frac"] == 1.0
    assert rep["kappa_violation_frac"] == 0.0
    assert rep["width_violation_frac"] == 0.0
    assert rep["mean_progress_segments"] > 32  # more than one lap's length
    assert rep["mean_pairwise_kappa_l1"] > 0.0


def test_track_quality_flags_bad_geometry():
    from levelgan.track.data import WIDTH_MIN, synthetic_tracks
    from levelgan.track.quality import track_quality_report

    tracks = synthetic_tracks(8, 32, seed=1).copy()
    tracks[:, :, 0] = 0.0            # straight line: heading never closes
    rep = track_quality_report(tracks)
    assert rep["closure_ok_frac"] == 0.0
    assert rep["closure_error_rad_mean"] == pytest.approx(2 * np.pi)
    assert rep["kappa_violation_frac"] == 0.0

    tracks[:, :, 1] = WIDTH_MIN / 4  # absurdly narrow: width bound flags
    rep = track_quality_report(tracks)
    assert rep["width_violation_frac"] == 1.0


def test_scripted_rollout_deterministic():
    from levelgan.track.data import synthetic_tracks
    from levelgan.track.quality import track_quality_report

    tracks = synthetic_tracks(16, 32, seed=9)
    a = track_quality_report(tracks)
    b = track_quality_report(tracks)
    assert a == b


def test_repair_uniform_placement_is_diverse_and_solvable():
    """placement='uniform' samples repair cells from the corpus's own
    placement law: positions spread over the grid (unlike the measured
    confidence-placement collapse) and GOAL still lands reachable."""
    import jax
    import jax.numpy as jnp
    from levelgan.config import GOAL, START
    from levelgan.env.solver import solvable
    from levelgan.ops.repair import ensure_start_goal

    b, h = 256, 16
    ids = np.zeros((b, h, h), np.uint8)              # all EMPTY, no S/G
    logits = jnp.zeros((b, h, h, 8), jnp.float32)    # uninformative model
    out = np.asarray(ensure_start_goal(
        jnp.asarray(ids), logits, key=jax.random.key(0),
        placement="uniform"))
    assert (out == START).any(axis=(1, 2)).all()
    assert (out == GOAL).any(axis=(1, 2)).all()
    sol = np.asarray(jax.jit(solvable)(jnp.asarray(out)))
    assert sol.mean() > 0.99                          # reachable placement
    # placements cover a large fraction of the grid (uniform law), not
    # the handful of cells confidence placement concentrates on
    for tile in (START, GOAL):
        distinct = int(((out == tile).sum(0) > 0).sum())
        assert distinct > h * h // 2, f"tile {tile}: {distinct} cells"
    # confidence placement with the same uninformative logits: argmax
    # degenerates to one cell -> the old behavior the option replaces
    conf = np.asarray(ensure_start_goal(jnp.asarray(ids), logits))
    assert int(((conf == START).sum(0) > 0).sum()) == 1

    with pytest.raises(ValueError, match="needs a PRNG key"):
        ensure_start_goal(jnp.asarray(ids), logits, placement="uniform")
    with pytest.raises(ValueError, match="placement"):
        ensure_start_goal(jnp.asarray(ids), logits, placement="bogus")


def test_repair_target_dist_honored():
    """uniform repair with target_dist places GOAL at (approximately) the
    requested normalized L1 distance from START — the export-level
    goal_dist guarantee for conditional models."""
    import jax
    import jax.numpy as jnp
    from levelgan.config import GOAL, START
    from levelgan.ops.repair import ensure_start_goal

    b, h = 128, 16
    ids = np.zeros((b, h, h), np.uint8)
    logits = jnp.zeros((b, h, h, 8), jnp.float32)
    # 0.8 covers the round-4 fix: a central START cannot reach 0.8, so
    # START placement must be biased to feasible (edge-ward) cells —
    # pre-fix the realized distance saturated at ~0.58
    # (artifacts/eval_cond_32_cm4_fit.json)
    for req in (0.2, 0.5, 0.8):
        out = np.asarray(ensure_start_goal(
            jnp.asarray(ids), logits, key=jax.random.key(1),
            placement="uniform", target_dist=np.full(b, req, np.float32)))
        sp = np.argwhere(out == START)
        gp_ = np.argwhere(out == GOAL)
        assert len(sp) == b and len(gp_) == b
        d = (np.abs(sp[:, 1] - gp_[:, 1])
             + np.abs(sp[:, 2] - gp_[:, 2])) / (2 * h)
        assert abs(d.mean() - req) < 0.05, (req, d.mean())

    with pytest.raises(ValueError, match="target_dist"):
        ensure_start_goal(jnp.asarray(ids), logits,
                          target_dist=np.full(b, 0.3, np.float32))
