#!/usr/bin/env python
"""PSNR of an encoded .jxl against its source .pfm, via the verification
decoder (the same oracle the golden tests use).

  python tools/psnr_file.py out.jxl source.pfm [more.jxl source.pfm ...]

Decoding runs on CPU (slow for 8MP — minutes); prints one line per pair.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from jxl_tiny_tpu.decode.decoder import decode_jxl
from jxl_tiny_tpu.io.pfm import read_pfm


def psnr(a, b):
    mse = float(((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2).mean())
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def main(argv):
    pairs = list(zip(argv[::2], argv[1::2]))
    for jxl_path, pfm_path in pairs:
        img = read_pfm(pfm_path)
        dec = decode_jxl(open(jxl_path, "rb").read())
        print(f"{jxl_path}: psnr={psnr(dec, img):.3f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
