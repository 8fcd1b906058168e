"""Export tier: the sample-generation / packing / repair path (SURVEY.md §3.2).

Reference equivalent: the sample-dump helper (SURVEY.md R12) plus the
bits the reference never had — on-device decode, bit-plane packing,
family repair policy.  Split out of ``api.py`` (round 5, advisor/VERDICT
r4 weak 6) so the train entrypoint module stays at train-loop altitude;
``levelgan.api`` re-exports every public name, so callers are unchanged.
This is the levels/sec/chip benchmark surface (BASELINE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from levelgan import rng
from levelgan.config import Config

def resolve_export_policy(cfg: Config, repair: bool | None = None,
                          repair_placement: str | None = None,
                          exactly_one: bool | None = None
                          ) -> tuple[bool, str, bool]:
    """Resolve (repair, placement, exactly_one) for the export path.

    ``None`` arguments read the config policy (``cfg.io.export_repair`` /
    ``export_repair_placement`` / ``export_exactly_one`` — rationale and
    measurement history in config.py and BASELINE.md rounds 3-5); explicit
    arguments override it.  Tile repair places missing START/GOAL tiles
    (ops/repair.py); track repair is the exact heading-closure projection
    (track/ops.closure_project).  ``exactly_one`` additionally dedups
    duplicate START/GOAL tiles and is tile-repair-only.
    """
    if repair is None:
        repair = {"auto": cfg.model.family == "track",
                  "on": True, "off": False}[cfg.io.export_repair]
    if repair_placement is None:
        repair_placement = cfg.io.export_repair_placement
    if exactly_one is None:
        exactly_one = {"auto": bool(repair) and cfg.model.family == "tile",
                       "on": True, "off": False}[cfg.io.export_exactly_one]
    return bool(repair), repair_placement, bool(exactly_one)


@functools.lru_cache(maxsize=32)
def make_generate_fn(cfg: Config, batch_size: int, pack: bool = False,
                     repair: bool | None = None,
                     repair_placement: str | None = None,
                     exactly_one: bool | None = None):
    """jit-compiled batched sampler: (params_g, key, cond) -> uint8 ids.

    Export path (SURVEY.md §3.2): z -> G -> argmax decode, all on-device;
    only the uint8 tile ids cross to host.  This is the levels/sec/chip
    benchmark surface (BASELINE.md).

    ``repair``/``repair_placement``/``exactly_one``: family-specific exact
    output repair — ``None`` reads the config policy (see
    ``resolve_export_policy`` and config.py IOConfig).

    ``pack=True`` (requires n_tiles <= 128) additionally bit-packs the tile
    ids ON DEVICE at ``ceil(log2(n_tiles))`` bits per tile (bit-plane
    layout: each group of 8 consecutive tiles becomes ``bits`` bytes)
    before the D2H transfer — host<->device bandwidth is the export
    bottleneck, so an 8-tile vocabulary moves 3 bits/tile instead of 8
    (2.67x fewer bytes).  Unpack with ``unpack_levels``.
    """
    from levelgan.data.codec import decode
    from levelgan.models import Generator

    repair, repair_placement, exactly_one = resolve_export_policy(
        cfg, repair, repair_placement, exactly_one)
    if cfg.model.family == "track":
        from levelgan.track.models import TrackGenerator

        tgen = TrackGenerator(cfg.model)

        @jax.jit
        def track_fn(params_g, key, cond=None):
            z = jax.random.normal(key, (batch_size, cfg.model.latent_dim),
                                  jnp.float32)
            tracks = tgen.apply({"params": params_g}, z, cond)
            if repair:
                # track-family repair = exact heading-closure projection
                # (track/ops.py closure_project), on-device like the tile
                # family's START/GOAL placement
                from levelgan.track.ops import closure_project
                tracks = closure_project(tracks)
            return tracks

        return track_fn

    gen = Generator(cfg.model)
    bits = tile_bits(cfg.model.n_tiles)
    if pack and bits >= 8:
        raise ValueError("pack=True requires n_tiles <= 128 (< 8 bits/tile)")
    # Export must match the TRAINED generative model: a Gumbel-head
    # generator is a sampling model (tiles ~ categorical(softmax(logits))),
    # so exporting argmax(logits) would collapse each cell to its mode and
    # skew the tile marginals. Softmax-head models train against the soft
    # sample whose decode IS argmax, so argmax export is faithful there.
    export_head = "gumbel" if cfg.model.head == "gumbel" else "argmax"

    @jax.jit
    def gen_fn(params_g, key, cond=None):
        from levelgan.models import sample_head

        k_z, k_s = jax.random.split(key)
        z = jax.random.normal(k_z, (batch_size, cfg.model.latent_dim),
                              jnp.float32)
        logits = gen.apply({"params": params_g}, z, cond)
        ids = decode(sample_head(k_s, logits, export_head,
                                 tau=cfg.model.tau_end,
                                 structural=cfg.model.structural_head))
        if repair:
            from levelgan.ops.repair import ensure_start_goal
            # derived lazily (fold_in) so enabling repair does not perturb
            # the legacy 2-way z/sample key stream — fixed-seed exports of
            # repair-disabled models stay bit-reproducible across rounds
            # (advisor r3)
            k_r = jax.random.fold_in(key, 2)
            # uniform repair on a conditional model honors the requested
            # goal_dist (cond dim 3, data/features.py) by construction —
            # the export-level guarantee for the condition dim training
            # cannot make causal (ops/repair.py docstring)
            target = (cond[:, 3] if repair_placement == "uniform"
                      and cond is not None and cfg.model.cond_dim >= 4
                      else None)
            ids = ensure_start_goal(ids, logits, key=k_r,
                                    placement=repair_placement,
                                    target_dist=target,
                                    exactly_one=exactly_one)
        if pack:
            # Bit-plane pack: 8 consecutive tiles -> `bits` bytes; byte j
            # holds bit j of each of the 8 tiles (tile k in bit position k).
            grp = ids.reshape(batch_size, -1, 8)
            w = jnp.left_shift(jnp.uint8(1), jnp.arange(8, dtype=jnp.uint8))
            planes = [
                jnp.sum(((grp >> jnp.uint8(j)) & jnp.uint8(1)) * w,
                        axis=-1, dtype=jnp.uint8)
                for j in range(bits)
            ]
            return jnp.stack(planes, axis=-1).reshape(batch_size, -1)
        return ids

    return gen_fn


def tile_bits(n_tiles: int) -> int:
    """Bits per tile id for the packed export wire format."""
    return max(1, (n_tiles - 1).bit_length())


def packed_bytes(model) -> int:
    """Packed bytes per level: H*W tiles at tile_bits() bits each."""
    return model.level_size * model.level_size * tile_bits(model.n_tiles) // 8


def unpack_levels(packed: np.ndarray, level_size: int,
                  out: np.ndarray | None = None) -> np.ndarray:
    """Invert the on-device bit-plane packing: [B, H*W*bits/8] -> uint8 [B, H, W].

    ``bits`` is self-describing given the level size (packed bytes * 8 / HW).
    ``out`` (uint8 [B, H, W]) lets callers stream chunk unpacks into one
    preallocated result; it may be uninitialized (plane 0 assigns, the rest
    OR in).
    """
    b = packed.shape[0]
    hw = level_size * level_size
    bits = packed.shape[1] * 8 // hw
    if out is None:
        out = np.empty((b, level_size, level_size), np.uint8)
    flat = out.reshape(b, hw)
    # Native tier first: a single pass over the packed bytes (spread-LUT,
    # one 8-byte store per 8-tile group) in levelgan/native/unpack.c —
    # ~10x the NumPy form on the 1-core host. Requires both sides
    # C-contiguous (the export path's buffers always are).
    if packed.flags.c_contiguous and flat.flags.c_contiguous:
        from levelgan.native import (unpack_native_available,
                                     unpack_planes_native)
        if unpack_native_available():
            unpack_planes_native(packed, bits, flat)
            return out
    # NumPy fallback. np.unpackbits runs the byte->bit expansion in C. The
    # earlier broadcasting form (grp >> shifts & 1 per plane) materialized
    # ~150 MB temporaries per op and took 16-44 s for a 37k-level gumbel_64
    # pull on this 1-core host — 10-20x the D2H transfer it postprocesses.
    grp = packed.reshape(b, hw // 8, bits)
    for j in range(bits):
        plane = np.unpackbits(np.ascontiguousarray(grp[:, :, j]),
                              axis=1, bitorder="little")
        if j == 0:
            flat[:] = plane          # assignment, not |=: out may be empty()
        else:
            flat |= plane << j
    return out


@functools.lru_cache(maxsize=32)
def make_generate_many_fn(cfg: Config, batch_size: int, n_batches: int,
                          pack: bool, repair: bool | None = None,
                          repair_placement: str | None = None,
                          exactly_one: bool | None = None):
    """ONE jit program generating ``n_batches`` batches via lax.fori_loop.

    Per-dispatch overhead dominates the export path (especially through the
    dev relay), so the batch loop lives on-device: one dispatch + one D2H
    transfer for the whole block.  Measured on gumbel_64: ~8x over
    per-batch dispatch.
    """
    gen_fn = make_generate_fn(cfg, batch_size, pack=pack, repair=repair,
                              repair_placement=repair_placement,
                              exactly_one=exactly_one)
    m = cfg.model
    per = packed_bytes(m) if pack else m.level_size * m.level_size

    @jax.jit
    def many(params_g, key, cond=None):
        keys = jax.random.split(key, n_batches)

        def body(i, out):
            ids = gen_fn(params_g, keys[i], cond)
            return jax.lax.dynamic_update_index_in_dim(
                out, ids.reshape(batch_size, per), i, 0)

        out0 = jnp.zeros((n_batches, batch_size, per), jnp.uint8)
        return jax.lax.fori_loop(0, n_batches, body, out0)

    return many


def generate(cfg: Config, params_g, n: int, *, seed: int = 0,
             batch_size: int = 1024, cond=None,
             pack: bool | None = None, repair: bool | None = None,
             repair_placement: str | None = None,
             exactly_one: bool | None = None) -> np.ndarray:
    """Generate ``n`` levels.

    Tile family: host uint8 [n, H, W]; ``pack=None`` auto-enables on-device
    bit-plane packing for the D2H transfer when the tile vocabulary fits
    under 8 bits AND H*W is a multiple of 8 (the pack groups 8 tiles per
    byte plane); the result is unpacked on host either way.  ``repair=True``
    guarantees >=1 START and >=1 GOAL per level, and with ``exactly_one``
    (config default: on when repairing) EXACTLY one of each (ops/repair.py).
    Track family: float32 [n, T, 2] (curvature, width) sequences — packing
    does not apply (rejected); repair applies the exact heading-closure
    projection (track/ops.py closure_project).  ``repair=None`` /
    ``repair_placement=None`` / ``exactly_one=None`` read the config policy
    (``cfg.io.export_*`` — see resolve_export_policy).
    """
    batch_size = min(batch_size, n)
    if cfg.model.family == "track":
        if pack:
            raise ValueError("pack=True is tile-family only; track export "
                             "returns float32 [n, T, 2] sequences")
        gen_fn = make_generate_fn(cfg, batch_size, repair=repair)
        if cond is not None:
            cond = jnp.broadcast_to(jnp.asarray(cond, jnp.float32),
                                    (batch_size, cfg.model.cond_dim))
        futures = []
        key = rng.key(cfg, seed)
        for _ in range(0, n, batch_size):
            key, sub = jax.random.split(key)
            futures.append(gen_fn(params_g, sub, cond))
        return np.concatenate([np.asarray(f) for f in futures])[:n]
    hw_mult8 = (cfg.model.level_size ** 2) % 8 == 0
    if pack is None:
        pack = tile_bits(cfg.model.n_tiles) < 8 and hw_mult8
    elif pack and not hw_mult8:
        raise ValueError(
            f"bit-plane packing needs H*W % 8 == 0, got level_size="
            f"{cfg.model.level_size} (H*W={cfg.model.level_size ** 2})")
    if cond is not None:
        cond = jnp.broadcast_to(jnp.asarray(cond, jnp.float32),
                                (batch_size, cfg.model.cond_dim))
    hw = cfg.model.level_size ** 2
    per = packed_bytes(cfg.model) if pack else hw
    n_batches_total = -(-n // batch_size)
    # Block size per dispatch: ~8MB of packed ids. Besides bounding device
    # memory, this is the measured D2H sweet spot of the dev relay (~40MB/s
    # at 8MB chunks vs 5-22MB/s on one monolithic 56MB pull), and smaller
    # blocks let copy_to_host_async overlap earlier blocks' transfers with
    # later blocks' compute.
    per_batch_bytes = batch_size * per
    nb_per_dispatch = max(1, min(n_batches_total,
                                 (8 << 20) // max(per_batch_bytes, 1)))
    futures = []
    key = rng.key(cfg, seed)
    done = 0
    while done < n_batches_total:
        key, sub = jax.random.split(key)
        # Exact-size tail program (one extra cached compile) instead of
        # running the full nb_per_dispatch block for a partial remainder —
        # the full block would compute and transfer up to
        # (nb_per_dispatch-1)*batch_size levels that get thrown away.
        nb = min(nb_per_dispatch, n_batches_total - done)
        many = make_generate_many_fn(cfg, batch_size, nb, pack, repair,
                                     repair_placement, exactly_one)
        out = many(params_g, sub, cond)
        # Kick off the D2H copy as soon as the block's compute retires so
        # transfers overlap later blocks' compute (double-buffered pulls;
        # the blocking np.asarray below then finds bytes already staged).
        out.copy_to_host_async()
        futures.append(out)
        done += nb
    # Stream the host side: unpack chunk i while chunks i+1.. are still in
    # flight.  Two wins on the 1-core host (measured, gumbel_64 n=102k):
    # the per-chunk temporaries are small and malloc-reused (the monolithic
    # unpack paid ~5 s of first-touch page faults on ~1.3 GB of fresh
    # temporaries), and the unpack CPU time hides under the remaining D2H
    # transfers instead of serializing after them.
    hside = cfg.model.level_size
    levels = np.empty((n_batches_total * batch_size, hside, hside), np.uint8)
    row = 0
    for f in futures:
        chunk = np.asarray(f).reshape(-1, per)   # blocks for THIS chunk only
        k = chunk.shape[0]
        if pack:
            unpack_levels(chunk, hside, out=levels[row:row + k])
        else:
            levels[row:row + k] = chunk.reshape(k, hside, hside)
        row += k
    return levels[:n]

