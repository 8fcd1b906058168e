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


def test_response_stats():
    from levelgan.lio.stats import response_stats

    req = np.linspace(0.1, 0.5, 5)
    perfect = response_stats(req, req)
    assert perfect["pearson_r"] > 0.999 and abs(perfect["slope"] - 1) < 1e-6
    atten = response_stats(req, 0.5 * req + 0.1)
    assert atten["pearson_r"] > 0.999 and abs(atten["slope"] - 0.5) < 1e-6
    ignoring = response_stats(req, np.full(5, 0.3))
    assert ignoring["pearson_r"] == 0.0 and ignoring["slope"] == 0.0


def test_quantile_buckets_partition():
    from levelgan.lio.stats import quantile_buckets

    rng = np.random.default_rng(0)
    v = rng.uniform(size=1000)
    buckets = quantile_buckets(v, 4)
    idx = np.sort(np.concatenate(buckets))
    assert np.array_equal(idx, np.arange(1000))  # exact partition
    sizes = [len(b) for b in buckets]
    assert min(sizes) > 200  # roughly quantile-balanced
    # heavily tied feature: buckets merge instead of erroring
    tied = np.repeat([0.0, 1.0], 500)
    tb = quantile_buckets(tied, 4)
    assert sum(len(b) for b in tb) == 1000


@pytest.mark.slow
def test_eval_cond_cli(tmp_path):
    """tools.eval_cond runs end-to-end on a (barely trained) conditional
    checkpoint: sweep + bucketed chi2 produced, gate semantics honored."""
    import json
    from contextlib import redirect_stdout
    import io as _io

    from levelgan.api import train
    from levelgan.config import preset
    from tools.eval_cond import main as eval_cond_main

    cfg = preset("conditional_32").override(**{
        "train.steps": 2, "train.batch_size": 8, "train.n_critic": 1,
        "model.base_channels": 16, "model.critic_base_channels": 16,
        "model.group_size": 8,
        "model.latent_dim": 16, "data.corpus_size": 64,
        "io.log_every": 10, "io.ckpt_every": 10,
        "io.out_dir": str(tmp_path)})
    res = train(cfg, echo=False)
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = eval_cond_main(["--ckpt", res["checkpoint"], "--n", "16",
                             "--points", "3", "--buckets", "2",
                             "--threshold", "-1.0"])
    report = json.loads(buf.getvalue())
    assert rc == 0 and report["passed"]  # threshold=-1 always passes
    assert set(report["dims"]) == {"wall_frac", "hazard_frac",
                                   "coin_frac", "goal_dist"}
    swept = [v for v in report["dims"].values() if "requested" in v]
    assert swept and all(len(v["requested"]) == 3 for v in swept)
    assert any(report["bucketed_chi2"].values())


def test_chi2_channel_breakdown():
    """channels= adds per-subset chi2 that isolates a planted positional
    anomaly in one tile channel."""
    from levelgan.config import GOAL, START
    from levelgan.lio.stats import per_position_chi2

    ref = synthetic_corpus(256, 16, seed=3)
    gen = synthetic_corpus(256, 16, seed=4).copy()
    gen[:, 2, 2] = START                       # collapse START onto one cell
    r = per_position_chi2(gen, ref, 8,
                          channels={"structural": (START, GOAL)})
    assert "chi2_per_dof_structural" in r
    base = per_position_chi2(synthetic_corpus(256, 16, seed=5), ref, 8,
                             channels={"structural": (START, GOAL)})
    # the anomaly shows up far stronger in the structural channel stat
    assert (r["chi2_per_dof_structural"]
            > 5 * base["chi2_per_dof_structural"])
