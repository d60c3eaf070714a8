#!/usr/bin/env python
"""Offline evaluation of the static-tier tables against the corpus.

Uses the per-(distance, image) histograms cached by gen_static_codes.py
(SIDECAR): predicts each corpus member's token bits under the shipped
static scheme vs its own optimal two-pass code. No encodes — pure
histogram arithmetic, so table/weighting changes evaluate in seconds.

The shipped scheme (gen_static_codes.py / entropy_write.load_static_codes):
  AC and DC each ship 12 candidate tables (content class x distance; DC
  smoothed only over format-possible tokens); the device picks the
  cheapest per image (dc_kernels.select_code_table) — evaluated here as
  the same argmin.

  python tools/eval_static_weights.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from jxl_tiny_tpu.entropy import build_entropy_code

SIDECAR = "/tmp/jxl_corpus_hists.npz"
NAMES = [
    "photo8mp", "grad512", "photo256", "odd131", "tiny64",
    "pink768", "pink512", "pinknoisy", "composite",
]
DISTS = (0.5, 1.0, 2.0)


def _bits(hist, code):
    depths = code.token_depths[code.context_map.astype(np.int64)]
    return float((hist * depths[: hist.shape[0]]).sum())


def _build_own(h):
    """What the two-pass encoder builds: unsmoothed, <=8 clusters."""
    return build_entropy_code(np.maximum(np.round(h), 0).astype(np.uint32))


def main():
    side = np.load(SIDECAR)
    ac, dc = side["ac"], side["dc"]
    ni = ac.shape[1]
    names = NAMES[:ni]

    path = os.path.join(
        os.path.dirname(__file__), "..", "jxl_tiny_tpu", "constants",
        "static_codes.npz",
    )
    tables = np.load(path)
    ac_codes = [build_entropy_code(h) for h in tables["ac_hists_k"]]
    dc_codes = [build_entropy_code(h) for h in tables["dc_hists_k"]]

    print(f"shipped static tables vs per-image two-pass (token bits):")
    print(
        f"{'member':12s} {'d':>4s} {'AC(best-of-K)':>14s} "
        f"{'DC(best-of-K)':>14s} {'picks':>6s}"
    )
    ac_all, dc_all = [], []
    for di, dist in enumerate(DISTS):
        for ii in range(ni):
            oa = _bits(ac[di, ii], _build_own(ac[di, ii]))
            od = _bits(dc[di, ii], _build_own(dc[di, ii]))
            ca = [_bits(ac[di, ii], c) for c in ac_codes]
            ka = int(np.argmin(ca))
            ra = ca[ka] / max(oa, 1) - 1
            cd = [_bits(dc[di, ii], c) for c in dc_codes]
            kd = int(np.argmin(cd))
            rd = cd[kd] / max(od, 1) - 1
            ac_all.append(ra)
            dc_all.append(rd)
            print(
                f"{names[ii]:12s} {dist:4.1f} {ra:+14.1%} {rd:+14.1%} "
                f"{ka:3d}/{kd:d}"
            )
    print(
        f"{'corpus avg':12s}      {np.mean(ac_all):+7.1%} "
        f"{np.mean(dc_all):+14.1%}"
    )


if __name__ == "__main__":
    main()
