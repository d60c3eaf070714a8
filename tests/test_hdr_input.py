"""HDR float input (PFM values exceed [0,1], README.md:20-24 of the
reference: values may exceed 1.0) must encode and decode sanely."""
import numpy as np
import pytest

from jxl_tiny_tpu.encoder import encode_image_device
from jxl_tiny_tpu.decode.decoder import decode_jxl


def test_hdr_roundtrip():
    rng = np.random.RandomState(21)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            2.5 + 1.5 * np.sin(xx * 0.05),
            1.8 + 1.2 * np.cos(yy * 0.04),
            0.9 + 0.8 * np.sin((xx + yy) * 0.02),
        ]
    ).astype(np.float32)
    img = np.maximum(img + rng.randn(3, h, w).astype(np.float32) * 0.05, 0)
    assert img.max() > 2.0

    data = encode_image_device(img, 1.0, upload_dtype=None)
    dec = np.asarray(decode_jxl(data))
    assert dec.shape == img.shape
    # Relative error small in the bright range (XYB is roughly cube-root
    # perceptual; at d=1.0 expect a few percent).
    rel = np.abs(dec - img) / np.maximum(img, 0.5)
    assert np.median(rel) < 0.05, f"median rel err {np.median(rel):.3f}"


@pytest.mark.slow  # 204s; hdr roundtrip runs by default
def test_hdr_saturating_quantizer_consistent():
    """Extreme-HDR content at low distance drives quantized DC/AC values
    past the 64-symbol alphabet's 16-bit ceiling (round-1 advisor finding:
    the device path used to mask to 16 bits silently). The saturating
    quantizer (C.AC_COEF_CLAMP / C.DC_VALUE_CLAMP, constants/__init__.py)
    must engage identically in the numpy golden, the XLA twin, and the
    Pallas kernels: streams stay valid and decodable, and decoded pixels
    are bit-identical across all three pipelines."""
    import jxl_tiny_tpu.constants as C
    from jxl_tiny_tpu.common import clamp_distance, compute_distance_params
    from jxl_tiny_tpu.encoder import (
        analyze_group_numpy,
        encode_image,
        encode_image_device,
        encode_image_jax,
    )

    rng = np.random.RandomState(5)
    h = w = 128
    # XYB's cube root compresses dynamic range, so only absurd float values
    # push AC coefficients past the clamp — exactly the input class PFM can
    # legally carry and the reference would corrupt on.
    img = rng.rand(3, h, w).astype(np.float32) * 2.0
    img[:, ::2, ::2] = 1e9  # high-frequency extreme checkerboard
    distance = 0.1

    # The clamp must actually engage on this content, else the test is vacuous.
    distp = compute_distance_params(clamp_distance(distance))
    g = analyze_group_numpy(img, 0, 0, distp)
    assert int(np.abs(g.quant_dc).max()) == C.DC_VALUE_CLAMP
    slot = np.arange(g.tokens.shape[-1])
    vals = (g.tokens & 0xFFFF)[slot < g.counts[..., None]]
    assert int(vals.max()) >= 2 * C.AC_COEF_CLAMP - 1  # PackSigned(clamped)

    d_np = encode_image(img, distance)
    d_jax = encode_image_jax(img, distance, fast=True)
    d_dev = encode_image_device(img, distance, upload_dtype=None)
    p_np = np.asarray(decode_jxl(d_np))
    p_jax = np.asarray(decode_jxl(d_jax))
    p_dev = np.asarray(decode_jxl(d_dev))
    # XLA twin and Pallas kernels must stay bit-identical (shared clamp
    # semantics); the numpy golden may diverge by float-ulp effects at 1e9
    # magnitudes (different fusion order), so it gets a tight relative bar.
    assert np.array_equal(p_jax, p_dev)
    rel = np.abs(p_np - p_jax) / np.maximum(np.abs(p_np), 1.0)
    assert np.median(rel) < 1e-3 and (rel < 0.2).mean() > 0.999
