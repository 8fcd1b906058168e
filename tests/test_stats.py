import pytest

import numpy as np

from levelgan.data.dataset import synthetic_corpus
from levelgan.lio.stats import kl_gate, per_position_chi2, per_position_counts


def test_per_position_counts():
    levels = np.asarray([[[0, 1], [2, 3]], [[0, 1], [3, 3]]], np.uint8)
    c = per_position_counts(levels, 4)
    assert c.shape == (2, 2, 4)
    assert c[0, 0, 0] == 2 and c[1, 1, 3] == 2 and c[1, 0, 2] == 1


def test_chi2_separates_matched_from_mismatched():
    a = synthetic_corpus(256, 16, seed=1)
    b = synthetic_corpus(256, 16, seed=2)          # same process, new draw
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 8, size=(256, 16, 16)).astype(np.uint8)
    good = per_position_chi2(a, b, 8)["chi2_per_dof_mean"]
    bad = per_position_chi2(junk, b, 8)["chi2_per_dof_mean"]
    assert good < 3.0 < bad


def test_kl_gate():
    a = synthetic_corpus(128, 16, seed=1)
    b = synthetic_corpus(512, 16, seed=2)
    ref = np.bincount(b.reshape(-1), minlength=8).astype(np.float64)
    res = kl_gate(a, ref, 8, threshold=0.05)
    assert res["passed"] and res["kl"] < 0.05
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 8, size=(128, 16, 16)).astype(np.uint8)
    assert not kl_gate(junk, ref, 8, threshold=0.05)["passed"]


@pytest.mark.slow
def test_validate_cli(tmp_path):
    """tools.validate runs end-to-end on a (barely trained) checkpoint."""
    import json
    from contextlib import redirect_stdout
    import io as _io

    from levelgan.api import train
    from levelgan.config import preset
    from tools.validate import main as validate_main

    cfg = preset("toy_dcgan_16").override(**{
        "train.steps": 2, "train.batch_size": 8,
        "model.base_channels": 16, "model.group_size": 8,
        "model.latent_dim": 16, "data.corpus_size": 32,
        "io.log_every": 10, "io.ckpt_every": 10,
        "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = validate_main(["--ckpt", res["checkpoint"], "--n", "400",
                            "--kl-threshold", "10.0"])
    report = json.loads(buf.getvalue())
    assert rc == 0 and report["passed"]
    assert report["tiles_sampled"] >= 100_000
    assert "chi2_per_dof_mean" in report
