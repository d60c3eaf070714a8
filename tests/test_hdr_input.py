"""HDR float input (PFM values exceed [0,1], README.md:20-24 of the
reference: values may exceed 1.0) must encode and decode sanely."""
import numpy as np

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
