import json

import jax.numpy as jnp
import numpy as np

from levelgan.lio import MetricsLogger, histogram_kl, kl_divergence, tile_histogram


def test_tile_histogram():
    ids = jnp.asarray([[0, 0], [1, 3]], dtype=jnp.uint8)
    h = np.asarray(tile_histogram(ids, 4))
    np.testing.assert_array_equal(h, [2, 1, 0, 1])


def test_kl_zero_for_identical():
    counts = jnp.asarray([100.0, 50.0, 25.0, 25.0])
    assert float(kl_divergence(counts, counts)) < 1e-9
    # add-one smoothing makes scaled counts only approximately equal
    assert float(kl_divergence(counts, counts * 7)) < 1e-3


def test_kl_positive_and_asymmetric():
    p = jnp.asarray([100.0, 1.0, 1.0, 1.0])
    q = jnp.asarray([25.0, 25.0, 25.0, 25.0])
    assert float(kl_divergence(p, q)) > 0.1
    assert abs(float(kl_divergence(p, q)) - float(kl_divergence(q, p))) > 1e-3


def test_histogram_kl_detects_mismatch():
    rng = np.random.default_rng(0)
    ref = np.asarray([4000.0, 1000, 500, 500, 100, 100, 100, 100])
    good = rng.choice(8, p=ref / ref.sum(), size=(10, 32, 32)).astype(np.uint8)
    bad = rng.integers(0, 8, size=(10, 32, 32)).astype(np.uint8)
    kl_good = float(histogram_kl(jnp.asarray(good), ref, 8))
    kl_bad = float(histogram_kl(jnp.asarray(bad), ref, 8))
    assert kl_good < 0.01 < kl_bad


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path), echo=False)
    log.log(0, d_loss=1.5, g_loss=jnp.asarray(2.5), n=3)
    log.log(1, d_loss=1.0)
    log.close()
    lines = [json.loads(l) for l in open(log.path)]
    assert lines[0]["step"] == 0 and lines[0]["g_loss"] == 2.5
    assert lines[1]["d_loss"] == 1.0 and "wall_time" in lines[1]
