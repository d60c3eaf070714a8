"""Restoration filters (decode.filters): signaling and rendering effect.

The frame header signals gaborish/EPF per distance (enc_frame.cc:147-153,
426-457); decode_jxl(filters=True) models stock-djxl rendering by applying
them. On the reference goldens the filters should *help* (deringing /
deblocking) — a strong behavioral check of the implementation since djxl
itself cannot run in this environment.
"""
import os

import numpy as np

from jxl_tiny_tpu.decode.decoder import decode_jxl
from jxl_tiny_tpu.io.pfm import read_pfm

from conftest import psnr


def test_no_filters_signaled_below_epf_threshold(testdata):
    """d=0.5 signals no filters: filtered and unfiltered decodes are
    bit-identical."""
    data = open(
        os.path.join(testdata, "golden", "gradient512_d0.5.jxl"), "rb"
    ).read()
    assert np.array_equal(decode_jxl(data), decode_jxl(data, filters=True))


def test_filters_improve_reference_goldens(testdata):
    """EPF1 (d=1.0) and gaborish+EPF2 (d=2.0) must improve PSNR on the
    reference-encoded gradient (measured +0.17 / +0.56 dB)."""
    orig = read_pfm(os.path.join(testdata, "gradient512.pfm"))
    for name in ("gradient512", "gradient512_d2.0"):
        data = open(
            os.path.join(testdata, "golden", f"{name}.jxl"), "rb"
        ).read()
        pre = psnr(np.clip(decode_jxl(data), 0, 1), orig)
        post = psnr(np.clip(decode_jxl(data, filters=True), 0, 1), orig)
        assert post > pre + 0.05, (name, pre, post)


def test_epf_respects_sigma_skip():
    """Blocks quantized finer than the minimum sigma are passed through
    untouched (kMinSigma skip)."""
    from jxl_tiny_tpu.decode.filters import epf

    rng = np.random.RandomState(0)
    xyb = rng.randn(3, 32, 32).astype(np.float32) * 0.1
    # Huge raw quant -> tiny sigma -> skip everywhere.
    out = epf(xyb, np.full((4, 4), 255, np.int32), 4.0, iters=2)
    assert np.array_equal(out, xyb)
    # Coarse quant -> filtering actually changes pixels.
    out2 = epf(xyb, np.ones((4, 4), np.int32), 0.05, iters=2)
    assert not np.array_equal(out2, xyb)
