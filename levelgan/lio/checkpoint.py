"""Checkpoint save/load — reference-semantics layout, atomic, framework-neutral.

Reference equivalent: ``torch.save({'generator': ..., 'discriminator': ...,
'optim_g': ..., 'optim_d': ..., 'step': ...}, path)`` + ``--resume``
(SURVEY.md R11 [TK-H]).  The torch format is an unsafe pickle, so the matched
surface here is the *semantics*: top-level entries ``generator /
discriminator / opt_g / opt_d / step / rng / config`` (SURVEY.md §5.4),
stored as a flat-key ``.npz`` + ``manifest.json`` in a per-step directory,
written atomically (write tmp dir, fsync, rename).  ``tools/export_torch_ckpt.py``
converts to a torch-loadable ``.pt`` with the same keys for reference-style
consumers.  See FORMAT.md for the full spec.
"""

from __future__ import annotations

import json
import os
import re
import shutil

import jax
import numpy as np

from levelgan.config import Config

FORMAT_VERSION = 1
_STEP_DIR = re.compile(r"^step_(\d{8})$")


def _flatten(tree, prefix: str = "") -> dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        ks = jax.tree_util.keystr(path, simple=True, separator="/")
        flat[f"{prefix}/{ks}" if ks else prefix] = np.asarray(leaf)
    return flat


def state_to_flat(state) -> dict[str, np.ndarray]:
    """GANState -> flat {key: array} with reference-layout top-level names."""
    flat: dict[str, np.ndarray] = {}
    for field, prefix in (("generator", "generator"),
                          ("discriminator", "discriminator"),
                          ("opt_g", "opt_g"), ("opt_d", "opt_d")):
        flat.update(_flatten(getattr(state, field), prefix))
    flat["step"] = np.asarray(state.step)
    flat["rng"] = np.asarray(jax.random.key_data(state.rng))
    flat["g_baseline"] = np.asarray(state.g_baseline)
    # extra fields (e.g. curriculum agent state) serialize under their name
    known = {"step", "rng", "generator", "discriminator", "opt_g", "opt_d",
             "g_baseline"}
    for name in type(state).__dataclass_fields__:
        if name not in known:
            flat.update(_flatten(getattr(state, name), name))
    return flat


def flat_to_state(example_state, flat: dict[str, np.ndarray]):
    """Rebuild a state pytree (shaped like ``example_state``) from flat keys."""
    def rebuild(field, prefix):
        tree = getattr(example_state, field)
        paths, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in paths:
            ks = jax.tree_util.keystr(path, simple=True, separator="/")
            key = f"{prefix}/{ks}" if ks else prefix
            if key not in flat:
                raise KeyError(f"checkpoint missing key '{key}'")
            arr = flat[key]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"checkpoint key '{key}' shape {arr.shape} != expected {leaf.shape}")
            leaves.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    updates = {}
    for name in type(example_state).__dataclass_fields__:
        if name == "step":
            updates["step"] = flat["step"].astype(np.int32)
        elif name == "rng":
            # Restore with the impl the run is configured for (the example
            # state's key carries it). Key-data shapes differ per impl —
            # threefry2x32 (2,) vs rbg (4,) — so a config/checkpoint impl
            # mismatch fails loudly here instead of corrupting the stream.
            impl = jax.random.key_impl(example_state.rng)
            expect = np.asarray(jax.random.key_data(example_state.rng)).shape
            if flat["rng"].shape != expect:
                raise ValueError(
                    f"checkpoint rng key-data shape {flat['rng'].shape} != "
                    f"{expect} expected by train.prng_impl={impl}; the "
                    "checkpoint was written under a different prng_impl")
            updates["rng"] = jax.random.wrap_key_data(flat["rng"], impl=impl)
        elif name == "g_baseline":
            updates["g_baseline"] = flat.get(
                "g_baseline", np.zeros((), np.float32))
        elif name == "g_ema":
            # pre-EMA checkpoints: fall back to the raw generator weights
            if any(k.startswith("g_ema/") or k == "g_ema" for k in flat):
                updates[name] = rebuild(name, name)
        else:
            updates[name] = rebuild(name, name)
    if "g_ema" not in updates:
        updates["g_ema"] = updates["generator"]
    return example_state.replace(**updates)


def save_checkpoint(ckpt_dir: str, state, cfg: Config,
                    keep: int = 0) -> str:
    """Atomically write ``ckpt_dir/step_XXXXXXXX``; returns the path."""
    step = int(np.asarray(state.step))
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"step_{step:08d}"
    final = os.path.join(ckpt_dir, name)
    tmp = os.path.join(ckpt_dir, f".tmp_{name}")
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    flat = state_to_flat(jax.device_get(state))
    arrays_path = os.path.join(tmp, "arrays.npz")
    np.savez(arrays_path, **flat)
    # fsync the array payload too (manifest alone was fsynced before): a
    # host crash between rename and writeback could otherwise leave a
    # valid-looking checkpoint with a truncated arrays.npz.
    fd = os.open(arrays_path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    manifest = {
        "format_version": FORMAT_VERSION,
        "step": step,
        "keys": sorted(flat.keys()),
        "config": cfg.to_dict(),
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)

    if keep > 0:
        for old in all_checkpoints(ckpt_dir)[:-keep]:
            shutil.rmtree(old)
    return final


def all_checkpoints(ckpt_dir: str) -> list[str]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for d in sorted(os.listdir(ckpt_dir)):
        if (_STEP_DIR.match(d)
                and os.path.exists(os.path.join(ckpt_dir, d, "manifest.json"))
                and os.path.exists(os.path.join(ckpt_dir, d, "arrays.npz"))):
            out.append(os.path.join(ckpt_dir, d))
    return out


def latest_checkpoint(ckpt_dir: str) -> str | None:
    ckpts = all_checkpoints(ckpt_dir)
    return ckpts[-1] if ckpts else None


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def load_checkpoint(path: str, example_state):
    """Restore (state, Config) from a checkpoint directory."""
    manifest = load_manifest(path)
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(f"checkpoint format {manifest['format_version']} "
                         f"newer than supported {FORMAT_VERSION}")
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = {k: z[k] for k in z.files}
    state = flat_to_state(example_state, flat)
    return state, Config.from_dict(manifest["config"])
