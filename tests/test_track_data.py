import numpy as np

from levelgan.track.data import (KAPPA_MAX, WIDTH_MAX, WIDTH_MIN,
                                 TrackDataset, centerline,
                                 curvature_histogram, synthetic_tracks)


def test_corpus_shapes_and_determinism():
    a = synthetic_tracks(8, 32, seed=1)
    b = synthetic_tracks(8, 32, seed=1)
    assert a.shape == (8, 32, 2) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, synthetic_tracks(8, 32, seed=2))


def test_corpus_physical_ranges():
    tr = synthetic_tracks(64, 32, seed=3)
    assert (np.abs(tr[..., 0]) <= KAPPA_MAX + 1e-6).all()
    assert (tr[..., 1] >= WIDTH_MIN - 1e-6).all()
    assert (tr[..., 1] <= WIDTH_MAX + 1e-6).all()


def test_corpus_closes_heading():
    tr = synthetic_tracks(32, 32, seed=4)
    total_turn = tr[..., 0].sum(-1)
    # heading closes exactly (+-2*pi up to clip slack)
    np.testing.assert_allclose(np.abs(total_turn), 2 * np.pi, rtol=0.05)
    cl = centerline(tr)
    gap = np.linalg.norm(cl[:, -1] - cl[:, 0], axis=-1)
    extent = np.ptp(cl, axis=1).max(-1)
    # positional closure is approximate; sanity: endpoint not running away
    assert (gap < 1.2 * extent).all()


def test_dataset_sampler_and_histogram():
    ds = TrackDataset(synthetic_tracks(64, 16, seed=5), seed=0)
    b = ds.sample_at(3, 8)
    np.testing.assert_array_equal(b, ds.sample_at(3, 8))  # stateless
    assert b.shape == (8, 16, 2)
    h = ds.tile_histogram()
    assert h.shape == (TrackDataset.N_BINS,)
    assert h.sum() == 64 * 16


def test_device_histogram_matches_numpy():
    import jax.numpy as jnp
    from levelgan.track.ops import curvature_hist_device

    tr = synthetic_tracks(16, 16, seed=6)
    np.testing.assert_array_equal(
        np.asarray(curvature_hist_device(jnp.asarray(tr), 16)),
        curvature_histogram(tr, 16))


def test_track_augment_invariances():
    import jax
    import jax.numpy as jnp
    from levelgan.track.ops import track_augment

    tr = jnp.asarray(synthetic_tracks(8, 16, seed=7))
    aug = np.asarray(track_augment(jax.random.key(0), tr))
    # curvature-magnitude multiset per track is preserved
    np.testing.assert_allclose(
        np.sort(np.abs(aug[..., 0]), -1),
        np.sort(np.abs(np.asarray(tr)[..., 0]), -1), atol=1e-6)
    # width multiset preserved
    np.testing.assert_allclose(
        np.sort(aug[..., 1], -1), np.sort(np.asarray(tr)[..., 1], -1),
        atol=1e-6)
