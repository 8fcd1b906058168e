"""Post-training skill-gap evaluation of curriculum checkpoints.

Reference equivalent: the reference's signature claim (SURVEY.md R9) is
that the curriculum trains G to emit levels that SEPARATE strong from weak
agents.  The training loop optimizes and logs that gap live
(train/curriculum.py metrics: ``skill_gap``), but "the trained generator's
levels discriminate skill" is a claim about the *checkpoint*, so this
module measures it at eval time: load the checkpoint's own trained
strong/weak agents (``CurriculumState.agent_strong/agent_weak`` — saved
with every curriculum checkpoint), roll BOTH on n generated and n corpus
levels, and report the per-agent return/playability plus the gap,
side-by-side — the corpus rows are the baseline that decides whether the
trained G separates agents *more than ordinary levels already do*.

All rollouts run as ONE jit program per (level-set, family): encode +
both agents' T-step ``lax.scan`` rollouts + scalar reductions on device;
only the summary floats cross to host.  ``tools/eval_quality`` calls this
automatically for ``loss='curriculum'`` checkpoints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from levelgan.config import Config


@functools.lru_cache(maxsize=8)
def _make_tile_prog(cfg: Config):
    from levelgan.data.codec import encode
    from levelgan.env.agent import policy_apply
    from levelgan.env.sim import rollout
    from levelgan.train.curriculum import env_params

    ep = env_params(cfg)

    @jax.jit
    def prog(agent_strong, agent_weak, ids, key):
        onehot = encode(ids, cfg.model.n_tiles)
        k_s, k_w = jax.random.split(key)
        t_s = rollout(policy_apply, agent_strong, ids, onehot, k_s, ep)
        t_w = rollout(policy_apply, agent_weak, ids, onehot, k_w, ep)
        return {
            "return_strong": t_s.total_return.mean(),
            "return_weak": t_w.total_return.mean(),
            "playable_strong": t_s.reached.astype(jnp.float32).mean(),
            "playable_weak": t_w.reached.astype(jnp.float32).mean(),
        }

    return prog


@functools.lru_cache(maxsize=8)
def _make_track_prog(cfg: Config):
    from levelgan.track.race import driver_apply, race_rollout
    from levelgan.track.train import race_params

    rp = race_params(cfg)

    @jax.jit
    def prog(agent_strong, agent_weak, tracks, key):
        k_s, k_w = jax.random.split(key)
        t_s = race_rollout(driver_apply, agent_strong, tracks, k_s, rp)
        t_w = race_rollout(driver_apply, agent_weak, tracks, k_w, rp)
        # progress is in segments; a lap = n_segments of it, so
        # progress / T is laps-equivalent "playability" for the race family
        t = tracks.shape[1]
        return {
            "return_strong": t_s.total_return.mean(),
            "return_weak": t_w.total_return.mean(),
            "playable_strong": (t_s.progress / t).mean(),
            "playable_weak": (t_w.progress / t).mean(),
            "crashes_strong": t_s.crashes.mean(),
            "crashes_weak": t_w.crashes.mean(),
        }

    return prog


def _score(cfg: Config, state, levels: np.ndarray, seed: int) -> dict:
    prog = (_make_track_prog(cfg) if cfg.model.family == "track"
            else _make_tile_prog(cfg))
    from levelgan import rng
    out = prog(state.agent_strong, state.agent_weak, jnp.asarray(levels),
               rng.key(cfg, seed))
    out = {k: float(v) for k, v in out.items()}
    out["return_gap"] = out["return_strong"] - out["return_weak"]
    out["playable_gap"] = out["playable_strong"] - out["playable_weak"]
    return out


def skill_gap_report(cfg: Config, state, gen_levels: np.ndarray,
                     corpus_levels: np.ndarray, *, seed: int = 0) -> dict:
    """Trained-agent skill gap on generated vs corpus levels.

    ``state`` must be a CurriculumState (checkpoint of a
    ``loss='curriculum'`` run).  ``separation`` is the headline number:
    return_gap(generated) − return_gap(corpus) — positive means the
    trained generator's levels discriminate agent skill better than
    corpus levels do.
    """
    if getattr(state, "agent_strong", None) is None:
        raise ValueError("checkpoint has no trained agents "
                         "(not a curriculum run)")
    gen = _score(cfg, state, gen_levels, seed)
    corpus = _score(cfg, state, corpus_levels, seed)
    return {
        "generated": gen,
        "corpus": corpus,
        "separation": gen["return_gap"] - corpus["return_gap"],
        "playable_separation": gen["playable_gap"] - corpus["playable_gap"],
    }
