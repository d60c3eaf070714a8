#!/usr/bin/env python
"""Train the static entropy-code tables for the one-pass tier.

The reference ships hand-baked static prefix codes for its OPTIMIZE_CODE=0
configuration (static_entropy_codes.h:502-971). Ours are trained: encode the
repo's test corpus with the two-pass pipeline, accumulate the base-64 AC
histograms and the 45-context DC histograms, +1-smooth (so every symbol is
codeable), and save to jxl_tiny_tpu/constants/static_codes.npz.

Run on CPU: python tools/gen_static_codes.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jxl_tiny_tpu.constants as C
from jxl_tiny_tpu.common import ImageDim, compute_distance_params, div_ceil
from jxl_tiny_tpu.io.pfm import read_pfm


def corpus_images():
    td = os.path.join(os.path.dirname(__file__), "..", "testdata")
    for name in ("gradient512.pfm", "photo256.pfm", "odd131x77.pfm"):
        p = os.path.join(td, name)
        if os.path.exists(p):
            yield read_pfm(p)
    # Synthetic variety: smooth, noisy, structured.
    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    yield np.stack(
        [
            0.5 + 0.5 * np.sin(xx * 0.21) * np.sin(yy * 0.17),
            np.clip(rng.rand(512, 512).astype(np.float32), 0, 1),
            (np.floor(xx / 37) % 2 * 0.8 + 0.1).astype(np.float32),
        ]
    )
    # Photographic-noise class (low-frequency content + sensor-like noise).
    yy, xx = np.mgrid[0:768, 0:1024].astype(np.float32)
    img = np.stack(
        [
            0.5 + 0.35 * np.sin(xx * 0.013) * np.cos(yy * 0.009),
            0.45 + 0.3 * np.sin(xx * 0.006 + 2.0) + 0.1 * np.cos(yy * 0.011),
            0.4 + 0.25 * np.cos((xx + yy) * 0.005),
        ]
    )
    img = np.clip(img * 0.5 + 0.25 + rng.randn(3, 768, 1024) * 0.015, 0, 1)
    yield (img ** 2.2).astype(np.float32)


def main():
    from jxl_tiny_tpu.ops.pipeline_jax import analyze_image_packed
    from jxl_tiny_tpu.encoder import DeviceEncodeJob, GroupResult, _build_dc_group
    import jxl_tiny_tpu.bitstream.sections as S

    ac_hist = np.zeros((64, 64), np.uint64)
    dc_hist = np.zeros((C.NUM_DC_CONTEXTS, C.ALPHABET_SIZE), np.uint64)
    for di, dist in enumerate((0.5, 1.0, 2.0)):
        for img in corpus_images():
            job = DeviceEncodeJob(img, dist, upload_dtype=None)
            job.pack()
            hists = np.asarray(job.out_a["hists"])
            ac_hist += hists[0].astype(np.uint64)
            dc_hist += hists[1][: C.NUM_DC_CONTEXTS].astype(np.uint64)
            print(f"d={dist} image done", file=sys.stderr)

    # +1 smoothing: every symbol must be codeable in the static tier.
    ac_hist = np.minimum(ac_hist + 1, 2**31).astype(np.uint32)
    dc_hist = np.minimum(dc_hist + 1, 2**31).astype(np.uint32)
    out = os.path.join(
        os.path.dirname(__file__), "..", "jxl_tiny_tpu", "constants",
        "static_codes.npz",
    )
    np.savez_compressed(out, ac_hist64=ac_hist, dc_hist=dc_hist)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
