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


def test_static_candidate_selection_matches_host():
    """The one-pass tier ships K candidate AC and DC tables and the device
    picks the cheapest per image (dc_kernels.select_code_table, exact
    integer argmin). The picks reported in `small` must equal the host's
    argmin over the same histograms, and ACGlobal/DCGlobal must serialize
    those candidates."""
    from jxl_tiny_tpu.encoder import DeviceEncodeJob
    from jxl_tiny_tpu.entropy.entropy_write import load_static_codes

    img = _image()
    job = DeviceEncodeJob(
        img, 1.0, upload_dtype=None, config=EncoderConfig(optimize_code=False)
    )
    job.pack()
    data = job.result()
    small = job._small_sync()
    k_ac, k_dc = int(small[-2]), int(small[-1])

    # Host recomputation from the two-pass pipeline's histograms
    # (select_code_table's split-sum argmin == the plain i64 argmin).
    ref = DeviceEncodeJob(img, 1.0, upload_dtype=None)
    ref.pack()
    hists = np.asarray(ref.out_a["hists"]).astype(np.int64)
    sc = load_static_codes()
    for k_dev, hist, depths in (
        (k_ac, hists[0], sc.ac_depths),
        (k_dc, hists[1], sc.dc_depths),
    ):
        costs = (hist[None] * depths).sum(axis=(1, 2))
        assert k_dev == int(np.argmin(costs)), (k_dev, costs)

    assert len(sc.ac_codes) > 1 and len(sc.dc_codes) > 1
    assert job.full_code is sc.ac_codes[k_ac]
    assert job.dc_code is sc.dc_codes[k_dc]
    assert decode_jxl(data) is not None


@pytest.mark.slow  # 343s; static candidate selection + tier combos run by default
def test_static_batch_matches_single_images():
    """The fused one-dispatch batch static program (per-image candidate
    selection vmapped over the image axis) must produce the same bytes as
    per-image static encodes."""
    from jxl_tiny_tpu.encoder import encode_batch_device

    cfg = EncoderConfig(optimize_code=False)
    rng = np.random.RandomState(1)
    imgs = [
        np.clip(
            rng.rand(3, 160, 200).astype(np.float32) * 0.5 + 0.2 + i * 0.1,
            0,
            1,
        )
        for i in range(2)
    ]
    singles = [
        encode_image_device(im, 1.0, upload_dtype=None, config=cfg)
        for im in imgs
    ]
    batch = encode_batch_device(imgs, 1.0, upload_dtype=None, config=cfg)
    assert batch == singles
    for b in batch:
        assert decode_jxl(b) is not None


@pytest.mark.slow  # 288s; the synthetic overhead bound runs by default
def test_static_codes_photographic_overhead():
    """On photographic content — what the corpus-trained tables are for —
    the static tier must stay within 6% of the two-pass size at the default
    distance (measured +3.4% on this crop with device-selected AC and DC
    candidates; +1.4% at d=0.5, +5.2% at d=2.0)."""
    from jxl_tiny_tpu.io.pfm import read_pfm

    import os

    path = os.path.join(os.path.dirname(__file__), "..", "testdata", "photo8mp.pfm")
    img = np.ascontiguousarray(read_pfm(path)[:, 1024:2048, 1024:2048])
    d_two = encode_image_device(img, 1.0, upload_dtype=None)
    d_one = encode_image_device(
        img, 1.0, upload_dtype=None, config=EncoderConfig(optimize_code=False)
    )
    assert len(d_one) < len(d_two) * 1.06, (len(d_one), len(d_two))
