#!/usr/bin/env python
"""Headline benchmark: 8MP PFM encode at distance 1.0, end-to-end
(pixels in host memory -> .jxl bytes), on the available TPU.

Prints ONE json line:
  {"metric": ..., "value": MP/s, "unit": "MP/s", "vs_baseline": ratio}

Baseline: the reference cjxl_tiny (C++, single-threaded) encodes the same
8MP image in 0.379s user time on this host = 21.9 MP/s (measured; the repo
publishes no numbers, see BASELINE.md).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_MPS = 21.9  # reference cjxl_tiny, single-core CPU, same image


def _load_image():
    from jxl_tiny_tpu.io.pfm import read_pfm

    path = os.path.join(REPO, "testdata", "photo8mp.pfm")
    if os.path.exists(path):
        return read_pfm(path)
    # Regenerate deterministically if testdata is absent.
    rng = np.random.RandomState(42)
    yy, xx = np.mgrid[0:2160, 0:3840].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.35 * np.sin(xx * 0.011) * np.cos(yy * 0.007),
            0.45 + 0.3 * np.sin(xx * 0.005 + 1.0) + 0.1 * np.cos(yy * 0.013),
            0.4 + 0.25 * np.cos((xx + yy) * 0.004),
        ]
    )
    img = np.clip(img * 0.5 + 0.25 + rng.randn(3, 2160, 3840) * 0.015, 0, 1)
    return (img ** 2.2).astype(np.float32)


def main():
    from jxl_tiny_tpu.encoder import encode_image_jax

    img = _load_image()
    mp = img.shape[1] * img.shape[2] / 1e6

    data = encode_image_jax(img, 1.0, upload_dtype=np.float16)  # compile
    times = []
    for _ in range(4):
        t = time.time()
        data = encode_image_jax(img, 1.0, upload_dtype=np.float16)
        times.append(time.time() - t)
    best = min(times)
    mps = mp / best
    print(
        json.dumps(
            {
                "metric": "encode megapixels/s/chip (8MP PFM, d=1.0, end-to-end)",
                "value": round(mps, 3),
                "unit": "MP/s",
                "vs_baseline": round(mps / BASELINE_MPS, 3),
                "detail": {
                    "times_s": [round(t, 3) for t in times],
                    "bytes": len(data),
                    "baseline_mps_cpu_ref": BASELINE_MPS,
                },
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
