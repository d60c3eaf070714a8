"""Quantify the one deliberate heuristic deviation from the reference.

The production pipelines compute the adaptive-quant field per whole 256x256
group; the reference computes it per 256x64 stripe with neighborhood
clamping at stripe boundaries (enc_frame.cc:729-756,
enc_adaptive_quantization.cc:396-410). ref/pipeline_np.py documents the
deviation as affecting "a handful of AQ-field pixels"; these tests turn
that claim into a measurement (VERDICT r1, missing item 5):

  1. field-level: fraction of 8x8 blocks whose raw quant differs on the
     photographic corpus image,
  2. output-level: bpp and PSNR of full encodes with each variant differ
     within noise.
"""
import os

import numpy as np
import pytest

from jxl_tiny_tpu.common import compute_distance_params
from jxl_tiny_tpu.io.pfm import read_pfm
from jxl_tiny_tpu.ref import pipeline_np as P

from conftest import psnr


def test_striped_aq_field_differs_in_few_blocks(testdata):
    """On real photographic content, group-edge vs stripe-edge clamping
    changes the rounded quant field only near internal stripe boundaries —
    a small fraction of all blocks."""
    img = read_pfm(os.path.join(testdata, "photo8mp.pfm"))
    distp = compute_distance_params(1.0)
    h, w = img.shape[1], img.shape[2]
    total = 0
    diff = 0
    qf_rel = []
    # Sample a grid of full groups across the image (field comparison only
    # needs the AQ stage, cheap enough to cover a wide area).
    for gy in range(0, h // 256, 2):
        for gx in range(0, w // 256, 2):
            patch = img[:, gy * 256 : gy * 256 + 256, gx * 256 : gx * 256 + 256]
            xyb = P.to_xyb(patch)
            _, _, raw_g = P.compute_adaptive_quant_field(
                xyb, distp.distance, distp.inv_scale
            )
            qf_s, _, raw_s = P.compute_adaptive_quant_field_striped(
                xyb, distp.distance, distp.inv_scale
            )
            total += raw_g.size
            diff += int((raw_g != raw_s).sum())
            qf_g = P.compute_adaptive_quant_field(
                xyb, distp.distance, distp.inv_scale
            )[0]
            qf_rel.append(
                float(np.max(np.abs(qf_g - qf_s) / np.maximum(qf_g, 1e-6)))
            )
    frac = diff / total
    # "A handful of pixels": stripe-boundary rows are 6/32 of all block rows;
    # only a fraction of those actually rounds differently.
    assert frac < 0.05, f"stripe-clamping changed {frac:.1%} of blocks"
    assert max(qf_rel) < 0.5  # the continuous field never diverges wildly


def test_striped_aq_output_within_noise(testdata):
    """Full encodes (host path) with group-edge vs stripe-edge AQ: bytes
    and PSNR must agree within noise on a textured crop."""
    from jxl_tiny_tpu.encoder import analyze_group_numpy, encode_image
    from jxl_tiny_tpu.decode.decoder import decode_jxl

    img = read_pfm(os.path.join(testdata, "photo8mp.pfm"))[:, 512:1024, 1024:1536]
    img = np.ascontiguousarray(img)

    def striped_fn(im, gx, gy, distp):
        return analyze_group_numpy(
            im, gx, gy, distp, aq_fn=P.compute_adaptive_quant_field_striped
        )

    data_g = encode_image(img, 1.0)
    data_s = encode_image(img, 1.0, analyze_fn=striped_fn)
    psnr_g = psnr(decode_jxl(data_g), img)
    psnr_s = psnr(decode_jxl(data_s), img)
    rel_size = abs(len(data_s) - len(data_g)) / len(data_g)
    assert rel_size < 0.01, (len(data_g), len(data_s))
    assert abs(psnr_g - psnr_s) < 0.1, (psnr_g, psnr_s)
