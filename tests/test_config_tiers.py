"""Capability tiers (common.EncoderConfig) mirror the reference's
config.h:10-12 toggles: every combination must produce a decodable stream."""
import numpy as np
import pytest

from jxl_tiny_tpu.common import EncoderConfig
from jxl_tiny_tpu.decode.decoder import decode_jxl
from jxl_tiny_tpu.encoder import encode_image_device


def _image():
    rng = np.random.RandomState(5)
    h, w = 160, 288
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.4 * np.sin(xx * 0.07) * np.cos(yy * 0.05),
            0.5 + 0.3 * np.sin((xx - yy) * 0.03),
            0.4 + 0.2 * np.cos(xx * 0.02),
        ]
    ).astype(np.float32)
    return np.clip(img + rng.randn(3, h, w).astype(np.float32) * 0.03, 0, 1)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


@pytest.mark.parametrize(
    "code,cfl,blocks",
    [
        (True, True, True),
        (False, True, True),
        (True, False, True),
        (True, True, False),
        (False, False, False),
    ],
)
def test_tier_combinations_decode(code, cfl, blocks):
    img = _image()
    cfg = EncoderConfig(
        optimize_code=code,
        optimize_chroma_from_luma=cfl,
        optimize_block_sizes=blocks,
    )
    data = encode_image_device(img, 1.0, upload_dtype=None, config=cfg)
    pix = np.clip(decode_jxl(data), 0, 1)
    p = _psnr(np.clip(img, 0, 1), pix)
    assert p > 30.0, f"PSNR {p:.2f} too low for tier {cfg}"


def test_static_codes_size_overhead_bounded():
    """One-pass static codes trade size for latency. Small noisy synthetics
    are the worst case for corpus-trained tables; bound them loosely. The
    photographic-typical bound is the separate test below."""
    img = _image()
    d_two = encode_image_device(img, 1.0, upload_dtype=None)
    d_one = encode_image_device(
        img, 1.0, upload_dtype=None, config=EncoderConfig(optimize_code=False)
    )
    assert len(d_one) < len(d_two) * 1.25


def test_static_dc_candidate_selection_matches_host():
    """The one-pass tier ships K candidate DC tables and the device picks
    the cheapest per image (dc_kernels.select_dc_table, exact integer
    argmin). The pick reported in `small` must equal the host's argmin over
    the same histogram, and DCGlobal must serialize that candidate."""
    import jax.numpy as jnp

    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.entropy.entropy_write import (
        _static_dc_depths,
        load_static_codes,
    )
    from jxl_tiny_tpu.ops.dc_kernels import dc_hist

    img = _image()
    job = DeviceEncodeJob(
        img, 1.0, upload_dtype=None, config=EncoderConfig(optimize_code=False)
    )
    job.pack()
    data = job.result()
    k_dev = int(job._small_sync()[-1])

    # Host recomputation from the two-pass pipeline's DC histogram.
    ref = DeviceEncodeJob(img, 1.0, upload_dtype=None)
    ref.pack()
    hist = np.asarray(ref.out_a["hists"])[1]
    depths = _static_dc_depths()
    costs = (hist.astype(np.int64)[None] * depths).sum(axis=(1, 2))
    assert k_dev == int(np.argmin(costs)), (k_dev, costs)

    _, _, dc_codes = load_static_codes()
    assert len(dc_codes) > 1
    assert job.dc_code is dc_codes[k_dev]
    assert decode_jxl(data) is not None


def test_static_codes_photographic_overhead():
    """On photographic content — what the corpus-trained tables are for —
    the static tier must stay within 10% of the two-pass size at the default
    distance (measured +8.0% on this crop with the device-selected DC
    candidate; +3.5% at d=0.5, +5.8% at d=2.0)."""
    from jxl_tiny_tpu.io.pfm import read_pfm

    import os

    path = os.path.join(os.path.dirname(__file__), "..", "testdata", "photo8mp.pfm")
    img = np.ascontiguousarray(read_pfm(path)[:, 1024:2048, 1024:2048])
    d_two = encode_image_device(img, 1.0, upload_dtype=None)
    d_one = encode_image_device(
        img, 1.0, upload_dtype=None, config=EncoderConfig(optimize_code=False)
    )
    assert len(d_one) < len(d_two) * 1.10, (len(d_one), len(d_two))
