#!/usr/bin/env python
"""Hardware smoke test: drive every encode path once on the attached TPU
and decode-check the output. CPU tests cover correctness in interpret mode;
this catches Mosaic/XLA-TPU-only breakage after kernel changes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def psnr(a, b):
    return float(10 * np.log10(1.0 / max(np.mean((a - b) ** 2), 1e-12)))


def check(name, data, src, min_psnr=30.0):
    from jxl_tiny_tpu.decode.decoder import decode_jxl

    pix = decode_jxl(data)
    p = psnr(np.asarray(pix), src)
    status = "ok" if p >= min_psnr else "LOW PSNR"
    print(f"{name:34s} {len(data):7d} B  psnr {p:6.2f}  {status}")
    assert p >= min_psnr, name


def main():
    from jxl_tiny_tpu.common import EncoderConfig
    from jxl_tiny_tpu.encoder import (
        encode_batch_device,
        encode_image_device,
        encode_image_device_mesh,
        encode_images_device,
    )
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.io.pfm import read_pfm

    img = read_pfm("testdata/gradient512.pfm")
    odd = read_pfm("testdata/odd131x77.pfm")
    u8 = linear_to_srgb_u8(img)
    lin_u8 = np.clip(
        np.where(
            u8 / 255.0 <= 0.04045,
            u8 / 255.0 / 12.92,
            ((u8 / 255.0 + 0.055) / 1.055) ** 2.4,
        ),
        0,
        1,
    ).astype(np.float32)

    t0 = time.time()
    check("flagship f16 512", encode_image_device(img, 1.0), img)
    check("flagship u8 512", encode_image_device(u8, 1.0), lin_u8)
    check("flagship odd 131x77", encode_image_device(odd, 1.0), odd)
    for d in (0.5, 2.0):
        check(f"distance {d}", encode_image_device(img, d), img,
              min_psnr=28.0 if d > 1 else 34.0)
    check(
        "one-pass static tier",
        encode_image_device(img, 1.0, config=EncoderConfig(optimize_code=False)),
        img,
    )
    check(
        "no-CfL no-blocks tier",
        encode_image_device(
            img, 1.0,
            config=EncoderConfig(
                optimize_chroma_from_luma=False, optimize_block_sizes=False
            ),
        ),
        img,
    )
    for name, data in zip(
        ("batched[0]", "batched[1]"), encode_batch_device([img, img * 0.7], 1.0)
    ):
        check(name, data, img if name.endswith("[0]") else img * 0.7)
    check(
        "batch static (fused single dispatch)",
        encode_batch_device(
            [img, img * 0.7], 1.0, config=EncoderConfig(optimize_code=False)
        )[0],
        img,
    )
    check("pipelined pair[0]", list(encode_images_device([img, odd]))[0], img)
    check("mesh (1 real chip)", encode_image_device_mesh(img, 1.0), img)
    print(f"all paths ok in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
