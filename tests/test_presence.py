"""Structural-tile presence prior (ops/presence.py, train.w_presence).

The in-training remedy for the measured rare-tile mode-drop
(BASELINE.md "Sample quality"): hinge penalty on per-level expected
START/GOAL counts, differentiable through the relaxed sample.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.config import GOAL, START, preset
from levelgan.ops.presence import presence_penalty
from levelgan.train.state import create_state
from levelgan.train.wgan_gp import make_wgan_gp_step

from tests.test_train_steps import TINY, _batch


def _onehot_level(ids, n_tiles=8):
    return jax.nn.one_hot(jnp.asarray(ids, jnp.int32), n_tiles,
                          dtype=jnp.float32)


def test_zero_when_tiles_present():
    ids = np.zeros((2, 4, 4), np.uint8)
    ids[:, 0, 0] = START
    ids[:, 3, 3] = GOAL
    assert float(presence_penalty(_onehot_level(ids))) == 0.0


def test_hinge_ignores_extra_tiles():
    # several STARTs/GOALs satisfy the >=1 hinge just as well as one
    ids = np.full((1, 4, 4), START, np.uint8)
    ids[0, :, 2:] = GOAL
    assert float(presence_penalty(_onehot_level(ids))) == 0.0


def test_penalty_on_missing_tiles():
    ids = np.zeros((2, 4, 4), np.uint8)          # all EMPTY: both missing
    # per missing tile: count deficit 1 + concentration deficit 1 -> 2.0
    assert float(presence_penalty(_onehot_level(ids))) == pytest.approx(2.0)
    ids[0, 1, 1] = START
    ids[0, 2, 2] = GOAL                          # level 0 fixed, level 1 not
    assert float(presence_penalty(_onehot_level(ids))) == pytest.approx(1.0)


def test_diffuse_probability_is_still_penalized():
    # the measured softmax-head failure mode: expected count ~1 spread over
    # all cells with no cell committing — count hinge satisfied, but the
    # argmax decode would never emit the tile; the concentration term fires
    p = 1.0 / 16                                 # 16 cells x 1/16 = 1.0
    soft = np.zeros((1, 4, 4, 8), np.float32)
    soft[..., START] = p
    soft[..., GOAL] = p
    soft[..., 0] = 1.0 - 2 * p
    pen = float(presence_penalty(jnp.asarray(soft)))
    assert pen == pytest.approx(2 * (1.0 - p) ** 2 / 2, rel=1e-5)
    assert pen > 0.8


def test_gradient_recovers_expected_counts():
    # minimizing the penalty through a softmax head drives the expected
    # START/GOAL counts up to the hinge target — the pathwise gradient the
    # score-function (REINFORCE) terms cannot provide
    key = jax.random.key(0)
    logits = jax.random.normal(key, (4, 8, 8, 8)) * 0.1
    # suppress the structural channels at init (mode-dropped generator);
    # softmax saturation makes the recovery gradient small, which is why
    # the training knob wants w_presence >> 1 on converged generators
    logits = logits.at[..., START].add(-4.0).at[..., GOAL].add(-4.0)
    # distinct best-candidate cells per channel, as the adversarial term
    # provides in training (corpus levels place START and GOAL apart) —
    # if both channels' best cell COINCIDES, the two concentration
    # gradients fight inside that cell's softmax and stall at 0.5/0.5
    logits = logits.at[:, 0, 0, START].add(1.0).at[:, 7, 7, GOAL].add(1.0)

    def loss(lg):
        return presence_penalty(jax.nn.softmax(lg, axis=-1))

    grad = jax.jit(jax.grad(loss))
    assert float(loss(logits)) > 0.5
    for _ in range(600):
        logits = logits - 30.0 * grad(logits)
    chans = jax.nn.softmax(logits, -1)[..., jnp.array([START, GOAL])]
    assert float(loss(logits)) < 0.05
    assert float(chans.sum(axis=(1, 2)).min()) > 0.7      # expected count
    assert float(chans.max(axis=(1, 2)).min()) > 0.8      # concentration


def test_wgan_step_with_presence_runs():
    """Fast tier: the w_presence branch traces, runs, and logs the metric."""
    cfg = preset("wgan_gp_32").override(
        **TINY, **{"train.n_critic": 2, "train.w_presence": 10.0})
    batch = _batch(cfg, n_critic=2)
    _, m1 = jax.jit(make_wgan_gp_step(cfg))(create_state(cfg), batch)
    assert np.isfinite(float(m1["g_loss"]))
    assert np.isfinite(float(m1["presence"])) and float(m1["presence"]) >= 0


@pytest.mark.slow
def test_wgan_step_presence_is_critic_neutral():
    # NOTE: at INIT the generator emits ~H*W/n_tiles expected tiles per
    # structural channel, so the hinge is satisfied and contributes zero
    # gradient — the prior only engages once training has mode-dropped the
    # channel (the measured failure it exists for). A one-step param-diff
    # test is therefore vacuous; the engaged-gradient behavior is covered
    # by test_gradient_recovers_expected_counts above.
    cfg = preset("wgan_gp_32").override(
        **TINY, **{"train.n_critic": 2, "train.w_presence": 10.0})
    base = preset("wgan_gp_32").override(**TINY, **{"train.n_critic": 2})
    batch = _batch(cfg, n_critic=2)
    s1, m1 = jax.jit(make_wgan_gp_step(cfg))(create_state(cfg), batch)
    s0, m0 = jax.jit(make_wgan_gp_step(base))(create_state(base), batch)
    assert np.isfinite(float(m1["g_loss"]))
    # the penalty value is observable when (and only when) the knob is on
    assert np.isfinite(float(m1["presence"])) and float(m1["presence"]) >= 0
    assert "presence" not in m0
    # presence is a generator-only term: the critic update is identical
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        jax.device_get(s1.discriminator), jax.device_get(s0.discriminator))


def test_track_family_rejects_presence():
    from levelgan.track.train import make_track_wgan_step
    cfg = preset("racetrack_32").override(**{"train.w_presence": 1.0})
    with pytest.raises(ValueError, match="tile-family only"):
        make_track_wgan_step(cfg)


def test_negative_weight_rejected():
    with pytest.raises(ValueError, match="w_presence"):
        preset("wgan_gp_32").override(**{"train.w_presence": -0.5})


def test_spread_zero_for_uniform_placement():
    """Corpus-shaped placement (a random cell per level) sits far above
    the min_eff floor -> the spread term vanishes at the corpus optimum."""
    rng = np.random.default_rng(0)
    b, h = 64, 8
    ids = np.zeros((b, h, h), np.uint8)
    cells = rng.integers(0, h * h, size=(b, 2))
    for i in range(b):
        ids[i, cells[i, 0] // h, cells[i, 0] % h] = START
        ids[i, cells[i, 1] // h, cells[i, 1] % h] = GOAL
    # overwrite collisions where GOAL landed on START's cell
    ids[np.arange(b), cells[:, 0] // h, cells[:, 0] % h] = START
    x = _onehot_level(ids)
    assert float(presence_penalty(x)) == pytest.approx(
        float(presence_penalty(x, w_spread=0.0)), abs=1e-7)


def test_spread_penalizes_positional_collapse():
    """Every level committing the SAME cell (the measured chi2-846 failure
    shape) is penalized by the spread term and invisible to the round-2
    count+concentration prior."""
    b, h = 64, 8
    ids = np.zeros((b, h, h), np.uint8)
    ids[:, 1, 1] = START
    ids[:, 6, 6] = GOAL
    x = _onehot_level(ids)
    old = float(presence_penalty(x, w_spread=0.0))
    new = float(presence_penalty(x))
    assert old == 0.0                      # round-2 prior is blind to this
    assert new > 1e-3                      # spread term sees it
    # gradient exists and points somewhere
    g = jax.grad(lambda y: presence_penalty(y))(x)
    assert float(jnp.abs(g).max()) > 0.0


def test_spread_gradient_diversifies():
    """The spread gradient should *lower* the collapsed cell's probability
    relative to unused cells (pushing placement apart across the batch)."""
    b, h = 16, 4
    # soft placements: every level puts mass 0.9 on cell (1,1), rest diffuse
    probs = np.full((b, h, h, 8), 1e-3, np.float32)
    probs[..., START] = 0.01
    probs[:, 1, 1, START] = 0.9
    probs[..., GOAL] = 0.5 / (h * h)       # GOAL diffuse: not collapsed
    probs[:, 0, 0, GOAL] = 0.6
    x = jnp.asarray(probs)
    # isolate the spread component (the concentration hinge's own gradient
    # pulls the max cell up; the spread term must push it down)
    g = jax.grad(lambda y: presence_penalty(y, w_spread=1.0)
                 - presence_penalty(y, w_spread=0.0))(x)
    g_start = np.asarray(g[..., START])
    # ascent direction at the collapsed cell must be positive (penalty
    # increases with more mass there) i.e. gradient-descent reduces it
    assert g_start[:, 1, 1].mean() > 0.0
    assert g_start[:, 1, 1].mean() > g_start[:, 2, 2].mean()


def test_spread_sees_soft_argmax_collapse():
    """Round-3 measured failure: with the relaxed softmax head, every
    level can put its argmax-winning (but fractional) mass on the SAME
    cell while spreading the rest; the soft marginal looks diverse, the
    decode collapses.  The sharpened (chans^8) spread distribution must
    see through it."""
    b, h = 64, 8
    probs = np.full((b, h, h, 8), 0.0, np.float32)
    # every level: winning 0.3 at (1,1), 0.011 everywhere else (sums ~1.0
    # over the channel -> count hinge quiet); argmax decode -> same cell
    probs[..., START] = 0.011
    probs[:, 1, 1, START] = 0.3
    probs[..., GOAL] = 0.011
    probs[:, 6, 6, GOAL] = 0.3
    x = jnp.asarray(probs)
    spread_only = float(presence_penalty(x, w_spread=1.0)
                        - presence_penalty(x, w_spread=0.0))
    assert spread_only > 1e-3  # sharpened marginal sees the collapse
    # same mass but winners spread across the batch -> no spread penalty
    probs2 = np.full((b, h, h, 8), 0.0, np.float32)
    probs2[..., START] = 0.011
    probs2[..., GOAL] = 0.011
    rng = np.random.default_rng(0)
    for i in range(b):
        r, c = rng.integers(0, h, 2)
        probs2[i, r, c, START] = 0.3
        probs2[i, (r + 4) % h, c, GOAL] = 0.3
    x2 = jnp.asarray(probs2)
    spread2 = float(presence_penalty(x2, w_spread=1.0)
                    - presence_penalty(x2, w_spread=0.0))
    assert spread2 < spread_only / 10


# ---- round-4 excess hinge (train.presence_excess) ---------------------------

def test_excess_zero_on_exactly_one():
    ids = np.zeros((2, 4, 4), np.uint8)
    ids[:, 0, 0] = START
    ids[:, 3, 3] = GOAL
    assert float(presence_penalty(_onehot_level(ids), w_excess=1.0)) == 0.0


def test_excess_penalizes_duplicates():
    # 2 STARTs: sum - max = 1 extra copy -> excess^2 = 1 for that tile
    ids = np.zeros((1, 4, 4), np.uint8)
    ids[0, 0, 0] = START
    ids[0, 2, 2] = START
    ids[0, 3, 3] = GOAL
    base = float(presence_penalty(_onehot_level(ids), w_excess=0.0))
    with_x = float(presence_penalty(_onehot_level(ids), w_excess=1.0))
    assert base == 0.0          # round-3 hinges are one-sided: excess free
    # mean over [B=1, |tiles|=2]: (1^2 + 0^2)/2
    assert with_x == pytest.approx(0.5)


def test_excess_band_tolerates_soft_mass():
    ids = np.zeros((1, 4, 4), np.uint8)
    ids[0, 0, 0] = START
    ids[0, 2, 2] = START
    ids[0, 3, 3] = GOAL
    assert float(presence_penalty(_onehot_level(ids), w_excess=1.0,
                                  excess_band=1.0)) == 0.0


def test_excess_no_penalty_on_diffuse_mass():
    """The measured round-4 first-cut failure: soft non-winner mass alone
    (sum - max ~ 1 with nothing winning argmax) must NOT fire the hinge —
    the decode emits no duplicate, so there is no excess to penalize
    (penalizing it destabilized the game: runs/wgan_presence_mbinx)."""
    p = 1.0 / 16
    soft = np.zeros((1, 4, 4, 8), np.float32)
    soft[..., 0] = 1.0 - 2 * p       # EMPTY wins every cell argmax
    soft[..., START] = p
    soft[..., GOAL] = p
    x = jnp.asarray(soft)
    excess_only = float(
        presence_penalty(x, w_excess=1.0, w_spread=0.0)
        - presence_penalty(x, w_excess=0.0, w_spread=0.0))
    assert excess_only == 0.0


def test_excess_gradient_spares_the_winner():
    # gradient must push down only NON-max cells' mass: the legitimate
    # placement (the argmax cell) keeps the count/concentration hinges
    # satisfied and must not be attacked by the excess term
    soft = np.zeros((1, 4, 4, 8), np.float32)
    soft[..., 0] = 1.0
    soft[0, 0, 0] = 0.0
    soft[0, 0, 0, START] = 0.9   # winner
    soft[0, 2, 2] = 0.0
    soft[0, 2, 2, START] = 0.6   # duplicate — wins its cell argmax too
    soft[0, 3, 3] = 0.0
    soft[0, 3, 3, GOAL] = 0.9

    def excess_only(x):
        return (presence_penalty(x, w_excess=1.0, w_spread=0.0)
                - presence_penalty(x, w_excess=0.0, w_spread=0.0))

    g = jax.grad(lambda x: excess_only(jnp.asarray(x)))(jnp.asarray(soft))
    assert float(g[0, 0, 0, START]) == pytest.approx(0.0, abs=1e-6)
    assert float(g[0, 2, 2, START]) > 0.0
    # surgical backward: NON-winning cells carry zero excess gradient (the
    # whole-grid surrogate leaked global logit pressure through the
    # softmax and diverged the game — runs/wgan_presence_mbinx6k)
    assert float(jnp.abs(g[0, 1, 1, START])) == pytest.approx(0.0, abs=1e-7)
    assert float(jnp.abs(g).sum()) == pytest.approx(
        float(jnp.abs(g[0, 2, 2, START])), rel=1e-5)


def test_excess_gradient_removes_duplicate_end_to_end():
    # gradient descent on the full prior from a 2-START level converges to
    # exactly one committed START (the corpus invariant)
    soft = np.zeros((1, 4, 4, 8), np.float32)
    soft[..., 0] = 1.0
    soft[0, 0, 0] = 0.0
    soft[0, 0, 0, START] = 0.9
    soft[0, 2, 2] = 0.0
    soft[0, 2, 2, START] = 0.8
    soft[0, 3, 3] = 0.0
    soft[0, 3, 3, GOAL] = 1.0
    x = jnp.asarray(soft)
    fn = jax.jit(jax.grad(lambda x: presence_penalty(
        x, w_excess=1.0, w_spread=0.0)))
    for _ in range(200):
        x = jnp.clip(x - 0.05 * fn(x), 0.0, 1.0)
    start = np.asarray(x[0, ..., START])
    assert (start > 0.5).sum() == 1          # one committed START left
    assert float(start[0, 0]) > 0.85         # and it is the original winner


def test_wgan_step_with_presence_excess_runs():
    cfg = preset("wgan_gp_32").override(**TINY, **{
        "train.w_presence": 1.0, "train.presence_excess": 1.0,
        "train.n_critic": 2})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    state, m = step(state, _batch(cfg, n_critic=2))
    assert np.isfinite(float(m["presence"]))


def test_negative_excess_rejected():
    with pytest.raises(ValueError):
        preset("wgan_gp_32").override(**{"train.presence_excess": -1.0})


def test_excess_weight_schedule():
    from levelgan.ops.presence import excess_weight_schedule

    # static off and static on (round-4 behavior) stay python floats
    t0 = preset("wgan_gp_32").train
    assert excess_weight_schedule(t0, 100) == 0.0
    t1 = preset("wgan_gp_32").override(
        **{"train.presence_excess": 0.5}).train
    assert excess_weight_schedule(t1, 100) == 0.5
    # ramp: 0 before start, linear rise, capped at the full weight
    tr = preset("wgan_gp_32").override(**{
        "train.presence_excess": 0.5, "train.presence_excess_start": 3000,
        "train.presence_excess_ramp": 1000}).train
    w = [float(excess_weight_schedule(tr, s))
         for s in (0, 3000, 3500, 4000, 9000)]
    assert w == pytest.approx([0.0, 0.0, 0.25, 0.5, 0.5])


def test_mbstd_scale_schedule():
    from levelgan.ops.presence import mbstd_scale_schedule

    t0 = preset("wgan_gp_32").train
    assert mbstd_scale_schedule(t0, 100) is None
    ta = preset("wgan_gp_32").override(**{
        "train.mbstd_anneal_start": 3000,
        "train.mbstd_anneal_steps": 2000}).train
    s = [float(mbstd_scale_schedule(ta, s))
         for s in (0, 3000, 4000, 5000, 9000)]
    assert s == pytest.approx([1.0, 1.0, 0.5, 0.0, 0.0])


def test_mbstd_scale_zero_matches_no_mbstd_critic():
    """With the channel fully annealed (scale 0) the input-mbstd critic
    scores like one whose stddev channel carries no batch signal."""
    from levelgan.models import Critic

    cfg = preset("wgan_gp_32").override(**TINY, **{
        "model.critic_mbstd": "input"}).model
    critic = Critic(cfg)
    x = jax.random.uniform(jax.random.key(0), (4, cfg.level_size,
                                               cfg.level_size, cfg.n_tiles))
    params = critic.init(jax.random.key(1), x)
    s_full = critic.apply(params, x, mbstd_scale=1.0)
    s_none = critic.apply(params, x)
    s_zero = critic.apply(params, x, mbstd_scale=0.0)
    np.testing.assert_allclose(np.asarray(s_full), np.asarray(s_none),
                               rtol=1e-6)
    # scale must actually change the program's output
    assert not np.allclose(np.asarray(s_zero), np.asarray(s_full))
    # and permuting the batch changes nothing at scale 0 (no batch signal
    # through the stddev channel; per-sample scores are batch-independent)
    s_perm = critic.apply(params, x[::-1], mbstd_scale=0.0)
    np.testing.assert_allclose(np.asarray(s_zero)[::-1], np.asarray(s_perm),
                               rtol=1e-5, atol=1e-5)


def test_freeze_critic_window():
    """freeze_critic_until: the critic (params + opt) is carried through
    unchanged while step < threshold, and trains normally after."""
    cfg = preset("wgan_gp_32").override(**TINY, **{
        "train.n_critic": 2, "train.freeze_critic_until": 2})
    state = create_state(cfg)
    step = jax.jit(make_wgan_gp_step(cfg))
    d0 = jax.tree.leaves(state.discriminator)[0]
    g0 = jax.tree.leaves(state.generator)[0]
    state, _ = step(state, _batch(cfg, n_critic=2))      # step 0: frozen
    state, _ = step(state, _batch(cfg, n_critic=2))      # step 1: frozen
    assert np.allclose(np.asarray(jax.tree.leaves(state.discriminator)[0]),
                       np.asarray(d0))
    assert not np.allclose(np.asarray(jax.tree.leaves(state.generator)[0]),
                           np.asarray(g0))               # G still learns
    state, _ = step(state, _batch(cfg, n_critic=2))      # step 2: live
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.discriminator)[0]), np.asarray(d0))


def test_finetune_levers_are_wgan_only():
    with pytest.raises(ValueError):
        preset("curriculum_16").override(
            **{"train.mbstd_anneal_steps": 100})
    with pytest.raises(ValueError):
        preset("toy_dcgan_16").override(
            **{"train.freeze_critic_until": 100})


def test_mbstd_anneal_floor_holds():
    from levelgan.ops.presence import mbstd_scale_schedule

    t = preset("wgan_gp_32").override(**{
        "train.mbstd_anneal_start": 1000, "train.mbstd_anneal_steps": 2000,
        "train.mbstd_anneal_floor": 0.4}).train
    s = [float(mbstd_scale_schedule(t, x)) for x in (0, 1000, 2000, 3000, 9000)]
    assert s == pytest.approx([1.0, 1.0, 0.7, 0.4, 0.4])
