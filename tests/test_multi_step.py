"""steps_per_dispatch: scanning K steps in one program must be semantically
identical to K single-step dispatches (f32; bf16 differs only by
compile-variant rounding)."""

import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'
import jax
import numpy as np

from levelgan.api import train
from levelgan.config import preset

BASE = {
    "train.batch_size": 8, "model.base_channels": 16, "model.group_size": 8,
    "model.latent_dim": 16, "data.corpus_size": 32, "model.dtype": "float32",
    "io.log_every": 4, "io.ckpt_every": 100,
}


def test_spd_equivalent_and_tail_chunk(tmp_path):
    # steps=10 with spd=4 exercises two full chunks + a tail of 2
    cfg1 = preset("toy_dcgan_16").override(
        **BASE, **{"train.steps": 10, "train.steps_per_dispatch": 1,
                   "io.out_dir": str(tmp_path / "a")})
    cfg4 = cfg1.override(**{"train.steps_per_dispatch": 4,
                            "io.out_dir": str(tmp_path / "b")})
    r1 = train(cfg1, echo=False)
    r4 = train(cfg4, echo=False)
    assert int(np.asarray(r4["state"].step)) == 10
    # Identical draws + identical math, but the scanned body and the
    # single-step program are different XLA compilations (the device-feed
    # gather fuses differently), so f32 rounding drifts a few ulp per step;
    # after 10 Adam steps that is ~1e-5 absolute on ~1e-3 params.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5),
        r1["state"].generator, r4["state"].generator)
    np.testing.assert_allclose(r1["kl"], r4["kl"], atol=1e-5)


def test_spd_wgan(tmp_path):
    cfg = preset("wgan_gp_32").override(
        **BASE, **{"train.steps": 4, "train.n_critic": 2,
                   "train.steps_per_dispatch": 2,
                   "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    assert int(np.asarray(res["state"].step)) == 4
    assert np.isfinite(res["metrics"]["d_loss"])
