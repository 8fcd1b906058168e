"""Kernel tier (SURVEY.md §4.2): Pallas K1 must match the XLA oracle,
forward and backward, on CPU (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from levelgan.kernels.upsample_block import upsample_block_pallas
from levelgan.ops.blocks import (conv_transpose_2x, conv_transpose_2x_parity,
                                 upsample_block_xla)


def _io(b, h, ci, co, seed=0):
    x = jax.random.normal(jax.random.key(seed), (b, h, h, ci), jnp.float32)
    w = jax.random.normal(jax.random.key(seed + 1), (4, 4, ci, co)) * 0.1
    gamma = jax.random.uniform(jax.random.key(seed + 2), (co,), minval=0.5,
                               maxval=1.5)
    beta = jax.random.normal(jax.random.key(seed + 3), (co,)) * 0.1
    return x, w, gamma, beta


def test_parity_decomposition_exact():
    """conv_transpose_2x_parity == lax.conv_transpose (the derived mapping)."""
    x = jax.random.normal(jax.random.key(1), (3, 8, 8, 16))
    w = jax.random.normal(jax.random.key(2), (4, 4, 16, 24)) * 0.1
    a = np.asarray(conv_transpose_2x(x, w, compute_dtype=jnp.float32))
    b = np.asarray(conv_transpose_2x_parity(x, w, compute_dtype=jnp.float32))
    np.testing.assert_allclose(a, b, atol=2e-6)


# One representative shape stays in the fast tier; the sweep runs under
# -m slow (and the real-chip variants in tests_tpu/). Interpret-mode
# compiles cost 8-15 s each on this 1-core host.
@pytest.mark.parametrize("b,h,ci,co", [
    (4, 4, 64, 32),    # deepest stage shape (scaled down)
    pytest.param(4, 8, 32, 16, marks=pytest.mark.slow),
    pytest.param(2, 16, 16, 16, marks=pytest.mark.slow),
    pytest.param(3, 4, 24, 8, marks=pytest.mark.slow),  # non-pow2
])
def test_pallas_forward_matches_oracle(b, h, ci, co):
    x, w, gamma, beta = _io(b, h, ci, co)
    y_x = np.asarray(upsample_block_xla(
        x, w, gamma, beta, slope=0.2, group_size=8,
        compute_dtype=jnp.float32))
    y_p = np.asarray(upsample_block_pallas(
        x, w, gamma, beta, slope=0.2, group_size=8,
        compute_dtype=jnp.float32))
    assert y_p.shape == (b, 2 * h, 2 * h, co)
    np.testing.assert_allclose(y_p, y_x, atol=1e-4, rtol=1e-4)


def _grad_of(fn):
    def loss(x, w, g, b):
        y = fn(x, w, g, b, slope=0.2, group_size=8,
               compute_dtype=jnp.float32)
        # non-uniform cotangent so the bwd sees a structured g
        return (y ** 2).sum() + 0.3 * y[..., 0].sum()
    return jax.grad(loss, argnums=(0, 1, 2, 3))


@pytest.mark.parametrize("b,h,ci,co", [
    (4, 4, 64, 32),    # deepest stage shape (scaled down)
    pytest.param(4, 8, 32, 16, marks=pytest.mark.slow),
    pytest.param(2, 16, 16, 16, marks=pytest.mark.slow),
    pytest.param(3, 4, 24, 8, marks=pytest.mark.slow),  # non-pow2
])
def test_pallas_backward_matches_oracle(b, h, ci, co):
    x, w, gamma, beta = _io(b, h, ci, co)
    gp = _grad_of(upsample_block_pallas)(x, w, gamma, beta)
    gx = _grad_of(upsample_block_xla)(x, w, gamma, beta)
    for i, (a, bb) in enumerate(zip(gp, gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=5e-3, rtol=1e-3, err_msg=f"arg {i}")


@pytest.mark.slow
def test_pallas_backward_batch_tiled(monkeypatch):
    """Force bt < b so the dgamma/dbeta cross-program accumulation and the
    per-tile dx/dy paths are exercised (the VMEM-exhaustion regime the CPU
    interpret tests would otherwise never reach)."""
    import levelgan.kernels.upsample_block as ub
    monkeypatch.setattr(ub, "_VMEM_BUDGET", 256 * 1024)
    ub._make_op.cache_clear()
    try:
        x, w, gamma, beta = _io(8, 8, 16, 16)
        gp = _grad_of(upsample_block_pallas)(x, w, gamma, beta)
        gx = _grad_of(upsample_block_xla)(x, w, gamma, beta)
        for i, (a, bb) in enumerate(zip(gp, gx)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=5e-3, rtol=1e-3, err_msg=f"arg {i}")
    finally:
        ub._make_op.cache_clear()


@pytest.mark.slow
def test_generator_grads_with_pallas_match_xla():
    """Whole-Generator backward with use_pallas on/off (the training path)."""
    from levelgan.config import ModelConfig
    from levelgan.models import Generator

    m_x = ModelConfig(level_size=16, base_channels=16, group_size=8,
                      latent_dim=8, dtype="float32", use_pallas=False)
    m_p = m_x.__class__(**{**m_x.__dict__, "use_pallas": True})
    z = jax.random.normal(jax.random.key(0), (4, 8))
    params = Generator(m_x).init(jax.random.key(1), z)["params"]

    def loss(model, p):
        return (Generator(model).apply({"params": p}, z) ** 2).mean()

    gx = jax.grad(lambda p: loss(m_x, p))(params)
    gp = jax.grad(lambda p: loss(m_p, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_p = jax.tree_util.tree_leaves(gp)
    for (path, a), b in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-3, rtol=5e-3,
            err_msg=jax.tree_util.keystr(path))


def test_pallas_bf16_close_to_f32_oracle():
    x, w, gamma, beta = _io(4, 8, 32, 16)
    y32 = np.asarray(upsample_block_xla(
        x, w, gamma, beta, slope=0.2, group_size=8,
        compute_dtype=jnp.float32))
    y16 = np.asarray(upsample_block_pallas(
        x.astype(jnp.bfloat16), w, gamma, beta, slope=0.2, group_size=8,
        compute_dtype=jnp.bfloat16)).astype(np.float32)
    # bf16 has ~3 decimal digits; activations are O(1) post-norm
    np.testing.assert_allclose(y16, y32, atol=0.1)


def test_generator_with_pallas_matches_xla():
    """End-to-end: the whole Generator forward with use_pallas on/off."""
    from levelgan.config import ModelConfig
    from levelgan.models import Generator

    m_x = ModelConfig(level_size=16, base_channels=16, group_size=8,
                      latent_dim=8, dtype="float32", use_pallas=False)
    m_p = m_x.__class__(**{**m_x.__dict__, "use_pallas": True})
    z = jax.random.normal(jax.random.key(0), (2, 8))
    params = Generator(m_x).init(jax.random.key(1), z)["params"]
    y_x = np.asarray(Generator(m_x).apply({"params": params}, z))
    y_p = np.asarray(Generator(m_p).apply({"params": params}, z))
    np.testing.assert_allclose(y_p, y_x, atol=2e-4, rtol=1e-3)


def test_bad_group_size_rejected():
    # co=25, gs=8 -> groups=3, 25 % 3 != 0 -> invalid grouping
    x, w, gamma, beta = _io(2, 4, 16, 25)
    with pytest.raises(ValueError):
        upsample_block_pallas(x, w, gamma, beta, group_size=8,
                              compute_dtype=jnp.float32)


# ---------------------------------------------------------------------------
# K1L: the row-tiled folded-emit variant (kernels/upsample_rows.py)
# ---------------------------------------------------------------------------

def _sm(x):
    """batch-major [B, H, W, C] -> spatial-major [H, W, B, C]."""
    return jnp.transpose(x, (1, 2, 0, 3))


@pytest.mark.parametrize("b,h,ci,co", [
    (4, 16, 32, 16),   # late-stage aspect ratio (scaled down)
    pytest.param(3, 8, 24, 32, marks=pytest.mark.slow),  # non-pow2, ci<co
    pytest.param(4, 32, 16, 8, marks=pytest.mark.slow),  # widest/narrowest
])
def test_rows_forward_matches_oracle(b, h, ci, co):
    from levelgan.kernels.upsample_rows import upsample_block_rows_sm

    x, w, gamma, beta = _io(b, h, ci, co)
    y_x = np.asarray(upsample_block_xla(
        x, w, gamma, beta, group_size=8, compute_dtype=jnp.float32))
    y_r = np.asarray(jnp.transpose(upsample_block_rows_sm(
        _sm(x), w, gamma, beta, group_size=8, compute_dtype=jnp.float32),
        (2, 0, 1, 3)))
    np.testing.assert_allclose(y_r, y_x, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("b,h,ci,co", [
    (4, 16, 32, 16),
    pytest.param(4, 32, 16, 8, marks=pytest.mark.slow),
])
def test_rows_backward_matches_oracle(b, h, ci, co):
    from levelgan.kernels.upsample_rows import upsample_block_rows_sm

    x, w, gamma, beta = _io(b, h, ci, co)

    def loss_rows(x, w, g, bb):
        y = upsample_block_rows_sm(_sm(x), w, g, bb, group_size=8,
                                   compute_dtype=jnp.float32)
        return (y.astype(jnp.float32) ** 2).mean()

    def loss_xla(x, w, g, bb):
        y = upsample_block_xla(x, w, g, bb, group_size=8,
                               compute_dtype=jnp.float32)
        return (y.astype(jnp.float32) ** 2).mean()

    g_r = jax.grad(loss_rows, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(x, w, gamma, beta)
    for i, (a, bb) in enumerate(zip(g_x, g_r)):
        np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                   atol=3e-6, rtol=2e-4, err_msg=f"arg {i}")


def test_fold_unfold_roundtrip():
    from levelgan.kernels.upsample_rows import fold, unfold

    y = jax.random.normal(jax.random.key(0), (8, 6, 3, 16))  # merged-shape
    np.testing.assert_array_equal(np.asarray(unfold(fold(y))), np.asarray(y))


def test_dispatch_covers_all_gumbel64_stages_bf16():
    """In the SHIPPED bf16 dtype every gumbel_64 stage must dispatch to a
    Pallas kernel (monolithic or row-tiled), never the XLA twin: a silent
    coverage regression would turn use_pallas=true into the fallback."""
    from levelgan.kernels.upsample_block import pallas_fits
    from levelgan.kernels.upsample_rows import rows_fits

    stages = [(64, 4, 512, 256), (64, 8, 256, 128),
              (64, 16, 128, 64), (64, 32, 64, 32)]
    uncovered = [s for s in stages
                 if not (pallas_fits(s[0], s[1], s[1], s[2], s[3],
                                     jnp.bfloat16)
                         or rows_fits(s[0], s[1], s[1], s[2], s[3],
                                      jnp.bfloat16))]
    assert not uncovered, f"stages with no fitting Pallas kernel: {uncovered}"


@pytest.mark.parametrize("b", [2, 3, 4, 8, 16, 24, 48, 64, 96, 128])
def test_batch_tiles_always_mosaic_legal(b):
    """Every tile the pickers can emit obeys the Mosaic sublane rule
    (bt % 8 == 0 or bt == b) and divides the batch — the round-2 on-chip
    lowering failure class."""
    from levelgan.kernels.upsample_block import _legal_tiles
    from levelgan.kernels.upsample_rows import _legal_bt

    for tiles in (_legal_tiles(b), _legal_bt(b)):
        assert tiles, f"no legal tiles for b={b}"
        for bt in tiles:
            assert b % bt == 0
            assert bt % 8 == 0 or bt == b
