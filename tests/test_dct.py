import numpy as np

from jxl_tiny_tpu.ref.dct_np import dct_matrix, idct_matrix, dct2d_blocks, idct2d_blocks
from jxl_tiny_tpu import constants as C


def test_dct_convention_n2():
    # Scaled convention: C0 = mean, C1 = (x0 - x1)/2 (see dct_np docstring).
    d = dct_matrix(2)
    x = np.array([3.0, 1.0], np.float32)
    c = d @ x
    assert np.isclose(c[0], 2.0)
    assert np.isclose(c[1], 1.0)


def test_dct_roundtrip():
    rng = np.random.RandomState(0)
    for n in (2, 8, 16):
        x = rng.randn(n).astype(np.float32)
        c = dct_matrix(n) @ x
        xr = idct_matrix(n) @ c
        np.testing.assert_allclose(xr, x, atol=1e-5)


def test_dct2d_roundtrip_all_shapes():
    rng = np.random.RandomState(1)
    for r, c in ((8, 8), (16, 8), (8, 16)):
        x = rng.randn(4, r, c).astype(np.float32)
        coef = dct2d_blocks(x)
        assert coef.shape == (4, min(r, c), max(r, c))
        xr = idct2d_blocks(coef, r, c)
        np.testing.assert_allclose(xr, x, atol=1e-4)


def test_dc_is_mean():
    rng = np.random.RandomState(2)
    for r, c in ((8, 8), (16, 8), (8, 16)):
        x = rng.randn(r, c).astype(np.float32)
        coef = dct2d_blocks(x[None])[0]
        assert np.isclose(coef[0, 0], x.mean(), atol=1e-5)


def test_llf_positions_16x8():
    """LLF of 2-block transforms sits at flat indices 0 and 1 (layout check
    against quant_weights.cc:140-157 which zeroes those inverse slots)."""
    # A vertical gradient in a 16x8-tall block excites yfreq=1 -> index 1.
    y = np.linspace(-1, 1, 16, dtype=np.float32)
    x16x8 = np.tile(y[:, None], (1, 8))
    coef = dct2d_blocks(x16x8[None])[0].ravel()
    top2 = np.argsort(-np.abs(coef))[:2]
    assert 1 in top2  # index 1 is the dominant LLF coefficient
    assert abs(coef[0]) < 1e-5  # mean is zero
    # A horizontal gradient in an 8x16-wide block also lands at index 1.
    x8x16 = np.tile(np.linspace(-1, 1, 16, dtype=np.float32)[None, :], (8, 1))
    coef = dct2d_blocks(x8x16[None])[0].ravel()
    assert np.argmax(np.abs(coef)) == 1


def test_dc_from_llf_matches_block_means():
    """DCFromLowestFrequencies (derived per dct_scales.h:53-58) must reproduce
    the per-8x8-block means of the reconstruction up to resampling."""
    from jxl_tiny_tpu.ref.group_np import _dc_from_llf

    rng = np.random.RandomState(3)
    x = rng.randn(16, 8).astype(np.float32)
    coef = dct2d_blocks(x[None])[0]  # vertical 16x8
    strat = np.full((1, 1), C.DCT16X8, np.uint8)
    dc = _dc_from_llf(coef[None, None], strat.astype(np.int32))[0, 0]
    # Decoder-side reconstruction from only c0, c1 equals these DCs; they
    # approximate the two half-block means.
    top_mean = x[:8].mean()
    bot_mean = x[8:].mean()
    assert abs(dc[0] - top_mean) < 0.2 * (abs(top_mean) + 1)
    # Exact inverse relation: c0 = (dc0+dc1)/2; c1 = (dc0-dc1)/(2*s).
    s = C.DCT_SCALE_16_TO_2
    np.testing.assert_allclose((dc[0] + dc[1]) / 2, coef[0, 0], atol=1e-5)
    np.testing.assert_allclose((dc[0] - dc[1]) / (2 * s), coef[0, 1], atol=1e-5)


def test_zigzag_orders_are_permutations():
    assert sorted(C.COEFF_ORDER8.tolist()) == list(range(64))
    assert sorted(C.COEFF_ORDER16.tolist()) == list(range(128))
    assert C.COEFF_ORDER8[0] == 0
    # LLF first for the shared 128 order.
    assert set(C.COEFF_ORDER16[:2].tolist()) == {0, 1}
