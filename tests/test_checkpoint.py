import glob
import os

import jax
import numpy as np
import pytest

from levelgan.config import preset
from levelgan.lio.checkpoint import (all_checkpoints, latest_checkpoint,
                                     load_checkpoint, load_manifest,
                                     save_checkpoint)
from levelgan.train.state import create_state

TINY = {
    "model.base_channels": 16, "model.critic_base_channels": 16,
    "model.latent_dim": 16, "model.group_size": 8,
    "train.batch_size": 8, "data.corpus_size": 32,
}


@pytest.fixture(scope="module")
def cfg():
    return preset("toy_dcgan_16").override(**TINY)


def _assert_tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b)


@pytest.mark.slow
def test_roundtrip(cfg, tmp_path):
    state = create_state(cfg)
    path = save_checkpoint(str(tmp_path), state, cfg)
    assert os.path.basename(path) == "step_00000000"

    restored, cfg2 = load_checkpoint(path, create_state(cfg, jax.random.key(99)))
    assert cfg2 == cfg
    for field in ("generator", "discriminator", "opt_g", "opt_d"):
        _assert_tree_equal(getattr(state, field), getattr(restored, field))
    assert int(restored.step) == int(state.step)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(restored.rng)),
        np.asarray(jax.random.key_data(state.rng)))


@pytest.mark.slow
def test_reference_key_layout(cfg, tmp_path):
    """Top-level key namespaces match the reference semantics (SURVEY §5.4)."""
    path = save_checkpoint(str(tmp_path), create_state(cfg), cfg)
    manifest = load_manifest(path)
    tops = {k.split("/")[0] for k in manifest["keys"]}
    assert {"generator", "discriminator", "opt_g", "opt_d",
            "step", "rng"} <= tops
    assert manifest["config"]["model"]["level_size"] == 16


def test_latest_and_keep(cfg, tmp_path):
    state = create_state(cfg)
    for s in (1, 2, 3, 4):
        state = state.replace(step=jax.numpy.asarray(s, jax.numpy.int32))
        save_checkpoint(str(tmp_path), state, cfg, keep=2)
    ckpts = all_checkpoints(str(tmp_path))
    assert [os.path.basename(c) for c in ckpts] == \
        ["step_00000003", "step_00000004"]
    assert latest_checkpoint(str(tmp_path)).endswith("step_00000004")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_no_partial_checkpoints(cfg, tmp_path):
    """Atomicity: no .tmp_* dirs remain after save."""
    save_checkpoint(str(tmp_path), create_state(cfg), cfg)
    assert not glob.glob(str(tmp_path / ".tmp_*"))


def test_shape_mismatch_rejected(cfg, tmp_path):
    path = save_checkpoint(str(tmp_path), create_state(cfg), cfg)
    other = preset("toy_dcgan_16").override(
        **{**TINY, "model.base_channels": 32})
    with pytest.raises((ValueError, KeyError)):
        load_checkpoint(path, create_state(other))


def test_load_generator_accepts_parent_dir(cfg, tmp_path):
    """load_generator resolves a ckpt parent (or run dir) to the newest
    complete step dir, so tools can take --ckpt runs/<name> directly."""
    from levelgan.cli.export import load_generator

    ckpt_dir = str(tmp_path / "ckpt")
    state = create_state(cfg)
    save_checkpoint(ckpt_dir, state, cfg)
    state2 = create_state(cfg, jax.random.key(7))
    state2 = state2.replace(step=state2.step + 5)
    save_checkpoint(ckpt_dir, state2, cfg)

    for target in (ckpt_dir, str(tmp_path)):       # ckpt dir and run dir
        cfg2, restored = load_generator(target)
        assert cfg2 == cfg
        assert int(restored.step) == 5             # newest step wins

    with pytest.raises(FileNotFoundError, match="no checkpoint"):
        load_generator(str(tmp_path / "empty"))


def test_load_generator_skips_corrupt_newest(cfg, tmp_path):
    """A truncated arrays.npz in the newest step (host crash mid-writeback)
    must not make the run unloadable: load_generator walks newest-to-oldest
    past unreadable steps, mirroring api.train's resume='auto'."""
    import os

    from levelgan.cli.export import load_generator

    ckpt_dir = str(tmp_path / "ckpt")
    state = create_state(cfg)
    save_checkpoint(ckpt_dir, state, cfg)
    state2 = create_state(cfg, jax.random.key(7))
    state2 = state2.replace(step=state2.step + 5)
    save_checkpoint(ckpt_dir, state2, cfg)

    newest = sorted(os.listdir(ckpt_dir))[-1]
    arrays = os.path.join(ckpt_dir, newest, "arrays.npz")
    with open(arrays, "r+b") as f:       # truncate mid-file
        f.truncate(os.path.getsize(arrays) // 2)

    cfg2, restored = load_generator(ckpt_dir)
    assert int(restored.step) == 0       # fell back to the older step

    # all steps unreadable -> loud failure listing what was tried
    oldest_arrays = os.path.join(ckpt_dir, sorted(os.listdir(ckpt_dir))[0],
                                 "arrays.npz")
    with open(oldest_arrays, "r+b") as f:
        f.truncate(1)
    with pytest.raises(FileNotFoundError, match="no readable checkpoint"):
        load_generator(ckpt_dir)
