"""Public API: ``train(cfg)`` — the train-loop entrypoint (SURVEY.md L7 [NS]).

Reference equivalent: the top-level train script ``main()`` (SURVEY.md R1).
TPU-first shape (SURVEY.md §3.1): the host loop ONLY feeds uint8 tile ids,
logs, and checkpoints; everything else — augment, encode, n_critic critic
updates, GP double-backward, G update, metrics — is inside one jit-compiled
step program, sharded over the data mesh.
"""

from __future__ import annotations

import functools
import os
import signal
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from levelgan import rng
from jax.sharding import PartitionSpec as P, NamedSharding

from levelgan.config import Config
from levelgan.data.dataset import LevelDataset
from levelgan.dist.mesh import make_mesh, replicated_sharding
from levelgan.lio.checkpoint import (load_checkpoint,
                                     save_checkpoint)
from levelgan.lio.metrics import MetricsLogger, kl_divergence
from levelgan.train.gan import make_gan_step
from levelgan.train.state import create_state, param_count
from levelgan.train.wgan_gp import make_wgan_gp_step


from levelgan.export import (generate, make_generate_fn,      # noqa: F401
                             make_generate_many_fn, packed_bytes,
                             resolve_export_policy, tile_bits,
                             unpack_levels)

@functools.lru_cache(maxsize=32)
def make_quality_probe(cfg: Config, n: int):
    """jit program logging training-time playability (io.quality_every):
    sample ``n`` fresh levels from the eval generator and reduce them to
    scalar fractions ON DEVICE (env/solver.py flood fill) — only three
    floats cross to host, so the probe never serializes the train loop
    the way a level pull would."""
    from levelgan.data.codec import decode
    from levelgan.env.solver import solvable, well_formed
    from levelgan.models import Generator, sample_head

    gen = Generator(cfg.model)
    export_head = "gumbel" if cfg.model.head == "gumbel" else "argmax"

    @jax.jit
    def probe(params_g, key, cond=None):
        k_z, k_s = jax.random.split(key)
        z = jax.random.normal(k_z, (n, cfg.model.latent_dim), jnp.float32)
        logits = gen.apply({"params": params_g}, z, cond)
        ids = decode(sample_head(k_s, logits, export_head,
                                 tau=cfg.model.tau_end,
                                 structural=cfg.model.structural_head))
        wf = well_formed(ids)
        return {"solvable_frac": jnp.mean(solvable(ids).astype(jnp.float32)),
                "has_start_frac": jnp.mean(wf["has_start"].astype(jnp.float32)),
                "has_goal_frac": jnp.mean(wf["has_goal"].astype(jnp.float32))}

    return probe



def make_step_fn(cfg: Config):
    if cfg.model.family == "track":
        if cfg.train.loss == "wgan_gp":
            from levelgan.track.train import make_track_wgan_step
            return make_track_wgan_step(cfg), "wgan_gp"
        if cfg.train.loss == "curriculum":
            from levelgan.track.train import make_track_curriculum_step
            return make_track_curriculum_step(cfg), "curriculum"
        raise ValueError(f"track family supports wgan_gp/curriculum, "
                         f"not '{cfg.train.loss}'")
    if cfg.train.loss == "gan":
        return make_gan_step(cfg), "gan"
    if cfg.train.loss == "wgan_gp":
        return make_wgan_gp_step(cfg), "wgan_gp"
    if cfg.train.loss == "curriculum":
        from levelgan.train.curriculum import make_curriculum_step
        return make_curriculum_step(cfg), "curriculum"
    raise ValueError(f"unknown loss '{cfg.train.loss}'")


def make_state(cfg: Config, key):
    if cfg.model.family == "track":
        from levelgan.track.train import (create_track_curriculum_state,
                                          create_track_state)
        return (create_track_curriculum_state(cfg, key)
                if cfg.train.loss == "curriculum"
                else create_track_state(cfg, key))
    if cfg.train.loss == "curriculum":
        from levelgan.train.curriculum import create_curriculum_state
        return create_curriculum_state(cfg, key)
    return create_state(cfg, key)


def make_dataset(cfg: Config):
    if cfg.model.family == "track":
        from levelgan.track.data import TrackDataset
        return TrackDataset.from_config(cfg.data, cfg.model,
                                        seed=cfg.train.seed)
    return LevelDataset.from_config(cfg.data, cfg.model, seed=cfg.train.seed)


def ref_histogram(cfg: Config, ds) -> np.ndarray:
    if cfg.model.family == "track":
        return ds.tile_histogram()
    return ds.tile_histogram(cfg.model.n_tiles)


def sample_batch(cfg: Config, ds: LevelDataset, kind: str,
                 step: int | None = None) -> np.ndarray:
    """Host-side: raw uint8 ids in the shape the step consumes.

    With ``step`` given the draw is stateless in (seed, step) — a resumed
    run consumes exactly the batches an uninterrupted run would.
    """
    b = cfg.train.batch_size
    draw = (lambda n: ds.sample(n)) if step is None else \
        (lambda n: ds.sample_at(step, n))
    if kind in ("wgan_gp", "curriculum"):
        n = cfg.train.n_critic
        flat = draw(n * b)
        return flat.reshape(n, b, *flat.shape[1:])
    return draw(b)


def batch_spec(kind: str, multi: bool = False) -> P:
    # batch axis is sharded on 'data'; the n_critic / steps-per-dispatch
    # super-axes are replicated
    spec = (None, "data") if kind in ("wgan_gp", "curriculum") else ("data",)
    return P(None, *spec) if multi else P(*spec)


def make_multi_step(step_fn, k: int):
    """Scan ``k`` train steps inside one jit program (one dispatch).

    Amortizes host->device dispatch latency (the dominant per-step cost on
    dispatch-latency-bound links; ~28ms on the dev relay).  Metrics: last
    step's scalars + the summed tile histogram across the k steps.
    """
    def multi(state, batches):
        state, ms = jax.lax.scan(step_fn, state, batches)
        metrics = {name: v[-1] for name, v in ms.items() if name != "gen_hist"}
        metrics["gen_hist"] = ms["gen_hist"].sum(axis=0)
        return state, metrics

    return multi


# ---- device-resident data feed (DataConfig.feed == 'device') ---------------
#
# The corpora here are small fixed arrays (default 4096 levels: 1-16 MB), so
# the TPU-first feed stages the WHOLE corpus into HBM once and samples
# minibatch indices INSIDE the jit step — a training dispatch then carries no
# per-step host->device data at all (the reference's per-step host->GPU copy,
# SURVEY.md §3.1, eliminated outright rather than merely overlapped).

_DATA_FOLD = 0x0DA7A           # fold tag separating the data index stream
_DEVICE_CORPUS_BUDGET = 256 * 1024 * 1024   # bytes; larger corpora feed from host


def corpus_array(ds) -> np.ndarray:
    """The dataset's backing array (uint8 levels / f32 tracks)."""
    return ds.levels if hasattr(ds, "levels") else ds.tracks


def make_device_feed_step(cfg: Config, step_fn, kind: str, mesh):
    """Wrap ``step_fn`` to draw its real batch from a device-resident corpus.

    The index draw is stateless in (train.seed, state.step): a resumed run
    consumes exactly the batches an uninterrupted run would (SURVEY.md §5.3),
    and every device computes the same indices (replicated key), with the
    gathered batch then sharded onto the 'data' mesh axis.
    """
    t = cfg.train
    shape = ((t.n_critic, t.batch_size) if kind in ("wgan_gp", "curriculum")
             else (t.batch_size,))
    b_sharding = NamedSharding(mesh, batch_spec(kind))

    def fed(state, corpus):
        k = jax.random.fold_in(
            jax.random.fold_in(rng.key(cfg), _DATA_FOLD), state.step)
        idx = jax.random.randint(k, shape, 0, corpus.shape[0])
        batch = jax.lax.with_sharding_constraint(
            jnp.take(corpus, idx, axis=0), b_sharding)
        return step_fn(state, batch)

    return fed


def make_multi_step_device(fed_step, k: int):
    """k device-fed steps in one dispatch — no scanned inputs at all."""
    def multi(state, corpus):
        state, ms = jax.lax.scan(lambda s, _: fed_step(s, corpus), state,
                                 None, length=k)
        metrics = {name: v[-1] for name, v in ms.items() if name != "gen_hist"}
        metrics["gen_hist"] = ms["gen_hist"].sum(axis=0)
        return state, metrics

    return multi


def train(cfg: Config, *, mesh=None, echo: bool = True) -> dict:
    """Run training per ``cfg``; returns a summary dict."""
    if cfg.io.debug_nans:
        # SURVEY.md §5.2: NaN propagation debug mode (reference had none)
        jax.config.update("jax_debug_nans", True)
    if cfg.io.compile_cache:
        # Persistent XLA compile cache: a preset's first compile costs
        # 20-40s through the relay; warm resumes start in seconds.
        from levelgan.xla_cache import enable as enable_xla_cache
        enable_xla_cache(None if cfg.io.compile_cache == "auto"
                         else cfg.io.compile_cache)
    if mesh is None:
        from levelgan.dist.mesh import init_distributed
        init_distributed(cfg.dist)
        mesh = make_mesh(cfg.dist.dp)
    n_dev = mesh.devices.size
    if cfg.train.batch_size % n_dev:
        raise ValueError(f"batch_size {cfg.train.batch_size} not divisible by "
                         f"mesh size {n_dev}")

    ds = make_dataset(cfg)
    ref_hist = ref_histogram(cfg, ds)

    step_fn, kind = make_step_fn(cfg)
    repl = replicated_sharding(mesh)
    b_shard = NamedSharding(mesh, batch_spec(kind))

    # on-device, replicated param init (single program, any mesh size)
    state = jax.jit(
        lambda k: make_state(cfg, k), out_shardings=repl)(
            rng.key(cfg))

    ckpt_dir = f"{cfg.io.out_dir}/ckpt"
    if cfg.io.resume == "auto":
        # Walk newest -> oldest past unreadable checkpoints (e.g. truncated
        # by a host crash) so auto-resume degrades to the last GOOD one
        # instead of dying on the corrupt latest.
        from levelgan.lio.checkpoint import all_checkpoints
        loaded = None
        candidates = all_checkpoints(ckpt_dir)
        for path in reversed(candidates):
            try:
                loaded = load_checkpoint(path, jax.device_get(state))[0]
                break
            except Exception as e:  # corrupt/partial: try the next older
                print(f"[levelgan] skipping unreadable checkpoint {path}: {e}")
        if loaded is not None:
            state = jax.device_put(loaded, repl)
            if echo:
                print(f"[levelgan] resumed from {path}")
        elif candidates:
            # Checkpoints exist but ALL failed to load: an automated
            # preemption-resume loop must not silently restart from step 0
            # (it would retrain from scratch on every preemption forever).
            raise RuntimeError(
                f"resume='auto': {len(candidates)} checkpoint(s) in "
                f"{ckpt_dir} but none loadable; refusing to silently "
                "restart from scratch (pass resume='' to force a fresh run)")
    elif cfg.io.resume:
        if not os.path.isdir(cfg.io.resume):
            raise FileNotFoundError(
                f"resume checkpoint not found: {cfg.io.resume}")
        state, _ = load_checkpoint(cfg.io.resume, jax.device_get(state))
        state = jax.device_put(state, repl)
        if echo:
            print(f"[levelgan] resumed from {cfg.io.resume}")

    spd = max(1, cfg.train.steps_per_dispatch)
    corpus_np = corpus_array(ds)
    feed_device = cfg.data.feed == "device"
    if feed_device and corpus_np.nbytes > _DEVICE_CORPUS_BUDGET:
        feed_device = False
        if echo:
            print(f"[levelgan] corpus ({corpus_np.nbytes >> 20} MiB) exceeds "
                  f"device-staging budget; feeding from host")
    fed_step = None
    corpus_dev = None
    if feed_device:
        corpus_dev = jax.device_put(corpus_np, repl)
        fed_step = make_device_feed_step(cfg, step_fn, kind, mesh)
        jit_step = jax.jit(
            make_multi_step_device(fed_step, spd) if spd > 1 else fed_step,
            donate_argnums=(0,), in_shardings=(repl, repl))
    elif spd > 1:
        mb_shard = NamedSharding(mesh, batch_spec(kind, multi=True))
        jit_step = jax.jit(make_multi_step(step_fn, spd), donate_argnums=(0,),
                           in_shardings=(repl, mb_shard))
    else:
        jit_step = jax.jit(step_fn, donate_argnums=(0,),
                           in_shardings=(repl, b_shard))

    logger = MetricsLogger(cfg.io.out_dir, echo=echo)
    tb_writer = None
    if cfg.io.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(f"{cfg.io.out_dir}/tb")
        except ImportError:
            print("[levelgan] tensorboard requested but torch unavailable; "
                  "JSONL metrics only")
    if echo:
        print(f"[levelgan] preset={cfg.preset} loss={kind} "
              f"mesh={n_dev}x{mesh.devices.flat[0].platform} "
              f"G params={param_count(state.generator):,} "
              f"D params={param_count(state.discriminator):,}")

    # Generated-tile histogram accumulates ON DEVICE (async adds); pulling it
    # to host every step would force a per-step sync and serialize dispatch.
    gen_hist_dev = jnp.zeros(len(ref_hist), jnp.float32)
    gen_hist = np.zeros(len(ref_hist), np.float64)
    start_step = int(jax.device_get(state.step))
    last_log_i = start_step
    t_last = time.monotonic()
    last_metrics: dict = {}
    profiling = False

    log_every = cfg.io.log_every
    ckpt_every = cfg.io.ckpt_every
    render_every = cfg.io.render_every
    quality_every = cfg.io.quality_every
    if quality_every and cfg.model.family != "tile":
        if echo:
            print("[levelgan] io.quality_every is tile-family only "
                  "(track quality = curvature gate); probe disabled")
        quality_every = 0
    # best-probe checkpoint selection (io.keep_best): playability declines
    # over training (see IOConfig.keep_best), so keep the best-so-far too
    best_solvable = -1.0
    keep_best = cfg.io.keep_best and quality_every > 0
    quality_probe = (make_quality_probe(cfg, cfg.io.quality_n)
                     if quality_every else None)
    probe_cond = (jnp.broadcast_to(
        jnp.full((cfg.model.cond_dim,), 0.25, jnp.float32),
        (cfg.io.quality_n, cfg.model.cond_dim))
        if quality_every and cfg.model.cond_dim else None)

    def _crossed(every: int, prev: int, cur: int) -> bool:
        # Cadence = boundary crossing, not `cur % every == 0`: a resumed run
        # whose start step is not a multiple of spd never lands exactly on a
        # multiple of `every`, which would silently disable periodic
        # logging/checkpointing for the whole resumed run.  Crossing also
        # makes cadences that are not multiples of steps_per_dispatch behave
        # as requested (fire at the first dispatch past each boundary)
        # instead of being silently floored to a multiple of spd.
        return bool(every) and (cur // every) > (prev // every)

    # Graceful preemption (SURVEY.md §5.3): SIGTERM/SIGINT requests a stop;
    # the loop finishes the in-flight dispatch, checkpoints atomically, and
    # returns — so `--resume auto` continues bit-exactly after the preempt.
    # Handlers are only installable from the main thread; elsewhere (e.g.
    # train() driven from a worker thread) preemption stays external.
    stop_requested = False
    old_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _request_stop(signum, frame):
            nonlocal stop_requested
            if stop_requested:
                # Second signal: stop being graceful — restore the previous
                # handlers and re-deliver, so a stuck compile/dispatch can
                # still be aborted the normal way.
                _restore_handlers()
                signal.raise_signal(signum)
                return
            stop_requested = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            old_handlers[sig] = signal.signal(sig, _request_stop)

    def _restore_handlers():
        while old_handlers:
            sig, h = old_handlers.popitem()
            signal.signal(sig, h)

    jit_tail = None  # single-step jit for a final chunk < spd (lazy)
    i = start_step
    try:
        while i < cfg.train.steps and not stop_requested:
            k = min(spd, cfg.train.steps - i)
            if cfg.io.profile and not profiling and i >= start_step + min(10, spd):
                jax.profiler.start_trace(cfg.io.profile_dir or
                                         f"{cfg.io.out_dir}/profile")
                profiling = True
            if feed_device:
                if k == spd:
                    state, metrics = jit_step(state, corpus_dev)
                else:
                    # final chunk < spd: single-step program over the same
                    # device corpus (stateless draws keep the stream aligned)
                    if jit_tail is None:
                        jit_tail = (jit_step if spd == 1 else jax.jit(
                            fed_step, donate_argnums=(0,),
                            in_shardings=(repl, repl)))
                    for j in range(k):
                        state, metrics = jit_tail(state, corpus_dev)
                        if j < k - 1:
                            gen_hist_dev = gen_hist_dev + metrics.pop("gen_hist")
            elif k == spd and spd > 1:
                batch = np.stack([sample_batch(cfg, ds, kind, step=i + j)
                                  for j in range(k)])
                if stop_requested:  # signal landed while stacking: sampling is
                    break           # stateless, so skipping the dispatch is safe
                state, metrics = jit_step(state, jax.device_put(batch, mb_shard))
            elif spd == 1:
                batch = jax.device_put(sample_batch(cfg, ds, kind, step=i), b_shard)
                if stop_requested:
                    break
                state, metrics = jit_step(state, batch)
            else:
                if jit_tail is None:
                    jit_tail = jax.jit(step_fn, donate_argnums=(0,),
                                       in_shardings=(repl, b_shard))
                for j in range(k):
                    batch = jax.device_put(
                        sample_batch(cfg, ds, kind, step=i + j), b_shard)
                    state, metrics = jit_tail(state, batch)
                    if j < k - 1:
                        gen_hist_dev = gen_hist_dev + metrics.pop("gen_hist")
            prev_i = i
            i += k
            if profiling and i >= start_step + min(10, spd) + 2 * spd + 10:
                jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                profiling = False

            gen_hist_dev = gen_hist_dev + metrics.pop("gen_hist")
            if _crossed(log_every, prev_i, i) or i == cfg.train.steps:
                metrics = jax.device_get(metrics)
                # per-window histogram: the logged KL reflects the CURRENT
                # generator, not a run-cumulative average that masks drift
                gen_hist = np.asarray(gen_hist_dev, np.float64)
                gen_hist_dev = jnp.zeros_like(gen_hist_dev)
                now = time.monotonic()
                kl = float(kl_divergence(gen_hist, ref_hist))
                last_metrics = logger.log(
                    i, **metrics, kl=kl,
                    step_ms=1e3 * (now - t_last) / (i - last_log_i))
                t_last = now
                last_log_i = i
                if tb_writer is not None:
                    for name, val in last_metrics.items():
                        if isinstance(val, (int, float)) and name != "step":
                            tb_writer.add_scalar(name, val, i)
            if _crossed(quality_every, prev_i, i):
                from levelgan.train.state import eval_generator_params
                q = jax.device_get(quality_probe(
                    eval_generator_params(state), rng.key(cfg, i), probe_cond))
                logger.log(i, **{k: float(v) for k, v in q.items()})
                if tb_writer is not None:
                    for name, val in q.items():
                        tb_writer.add_scalar(name, float(val), i)
                if keep_best and float(q["solvable_frac"]) > best_solvable:
                    best_solvable = float(q["solvable_frac"])
                    best_path = save_checkpoint(
                        f"{cfg.io.out_dir}/ckpt_best", state, cfg, keep=1)
                    if echo:
                        print(f"[levelgan] new best solvable_frac="
                              f"{best_solvable:.3f} -> {best_path}")
            if _crossed(render_every, prev_i, i):
                from levelgan.train.state import eval_generator_params
                samples = generate(cfg, eval_generator_params(state), 16, batch_size=16,
                                   seed=i,
                                   cond=(np.full(cfg.model.cond_dim, 0.25,
                                                 np.float32)
                                         if cfg.model.cond_dim else None))
                if cfg.model.family == "track":
                    from levelgan.track.render import write_track_png
                    write_track_png(f"{cfg.io.out_dir}/tracks_{i:08d}.png",
                                    samples, cols=4)
                else:
                    from levelgan.cli.export import write_png
                    write_png(f"{cfg.io.out_dir}/levels_{i:08d}.png", samples,
                              cols=4)
            if _crossed(ckpt_every, prev_i, i) and i < cfg.train.steps:
                save_checkpoint(ckpt_dir, state, cfg, keep=cfg.io.keep_ckpts)
    finally:
        # Runs on normal exit, preemption, AND exceptions: never leave the
        # process with our signal handlers, an unflushed profiler trace, or
        # buffered metrics (SummaryWriter flushes on a 120s timer — a short
        # run or an exception would otherwise drop its scalars).
        if profiling:
            jax.profiler.stop_trace()
            profiling = False
        _restore_handlers()
        if tb_writer is not None:
            tb_writer.close()
        logger.close()

    preempted = stop_requested and i < cfg.train.steps
    final_path = save_checkpoint(ckpt_dir, state, cfg, keep=cfg.io.keep_ckpts)
    if preempted and echo:
        print(f"[levelgan] preempted at step {i}; checkpoint saved to "
              f"{final_path} — resume with io.resume=auto")
    # A preemption (or log_every=0) can exit mid-window: the counts since the
    # last log boundary live in gen_hist_dev and reflect the CURRENT
    # generator; without this the returned kl would be computed from a stale
    # (possibly all-zero) window.
    tail_hist = np.asarray(jax.device_get(gen_hist_dev), np.float64)
    if tail_hist.sum() > 0:
        gen_hist = tail_hist
    return {"state": state, "checkpoint": final_path,
            "preempted": preempted,
            "metrics": last_metrics,
            "kl": float(kl_divergence(gen_hist, ref_hist)),
            "ref_hist": ref_hist, "gen_hist": gen_hist}
