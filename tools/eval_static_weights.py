#!/usr/bin/env python
"""Offline evaluation of static-table weightings against the corpus.

Uses the per-(distance, image) histograms cached by gen_static_codes.py
(SIDECAR): for a candidate weighting, build the static entropy code and
predict each corpus member's AC+DC token bits under it vs under its own
optimal two-pass code. No encodes — pure histogram arithmetic, so dozens
of weightings evaluate in seconds.

  python tools/eval_static_weights.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jxl_tiny_tpu.constants as C
from jxl_tiny_tpu.entropy import build_entropy_code

SIDECAR = "/tmp/jxl_corpus_hists.npz"


def _bits_under(hist, code):
    """Token bits for [M, 64] histograms under an EntropyCode built on the
    same context space."""
    depths = code.token_depths[code.context_map.astype(np.int64)]  # [M,64]
    m = hist.shape[0]
    return float((hist * depths[:m]).sum())


def _build(hist):
    h = np.minimum(np.round(hist) + 1, 2**31).astype(np.uint32)
    return build_entropy_code(h)


def evaluate(ac, dc, weights, names, dist_weights=(1.0, 1.0, 1.0)):
    """ac/dc: [3, n_img, ...] per-(distance, image) histograms."""
    nd, ni = ac.shape[:2]
    w = np.asarray(weights, np.float64)
    dw = np.asarray(dist_weights, np.float64)
    ac_t = np.zeros_like(ac[0, 0])
    dc_t = np.zeros_like(dc[0, 0])
    for di in range(nd):
        for ii in range(ni):
            s = w[ii] * dw[di] * 1e6
            ac_t += ac[di, ii] * (s / max(ac[di, ii].sum(), 1.0))
            dc_t += dc[di, ii] * (s / max(dc[di, ii].sum(), 1.0))
    code_ac, code_dc = _build(ac_t), _build(dc_t)
    rows = []
    for di, dist in enumerate((0.5, 1.0, 2.0)):
        for ii in range(ni):
            own_ac = _bits_under(ac[di, ii], _build(ac[di, ii]))
            own_dc = _bits_under(dc[di, ii], _build(dc[di, ii]))
            st_ac = _bits_under(ac[di, ii], code_ac)
            st_dc = _bits_under(dc[di, ii], code_dc)
            oh = (st_ac + st_dc) / max(own_ac + own_dc, 1.0) - 1.0
            rows.append((dist, names[ii], oh))
    return rows


def main():
    d = np.load(SIDECAR)
    ac, dc = d["ac"], d["dc"]
    ni = ac.shape[1]
    names = [
        "photo8mp", "grad512", "photo256", "odd131", "tiny64",
        "pink768", "pink512", "pinknoisy", "composite",
    ][:ni]
    cands = {
        "equal": ([1.0] * ni, (1, 1, 1)),
        "real-dominant": ([8, 2, 2, 1, 1, 1, 1, 1, 1][:ni], (1, 1, 1)),
        # The shipped weighting (gen_static_codes.IMAGE_WEIGHTS +
        # DIST_WEIGHTS): d-tilt flattens photo8mp's per-distance overhead
        # from +4/+11/+20% to +4/+9/+7%.
        "shipped-d-tilt": ([8, 2, 2, 1, 1, 1, 1, 1, 1][:ni], (1, 1.5, 3)),
        "photo-heavy": ([16, 2, 4, 1, 1, 2, 2, 2, 1][:ni], (1, 1, 1)),
        "photo-only": ([1, 0, 0, 0, 0, 0, 0, 0, 0][:ni], (1, 1, 1)),
        "real-only": ([4, 1, 1, 1, 1, 0, 0, 0, 0][:ni], (1, 1, 1)),
    }
    for name, (w, dw) in cands.items():
        rows = evaluate(ac, dc, w, names, dw)
        photo = [r[2] for r in rows if r[1] in ("photo8mp", "photo256")]
        other = [r[2] for r in rows if r[1] not in ("photo8mp", "photo256")]
        worst = max(rows, key=lambda r: r[2])
        print(
            f"{name:14s} photo avg {np.mean(photo):+.1%}  "
            f"other avg {np.mean(other):+.1%}  "
            f"worst {worst[1]}@d{worst[0]} {worst[2]:+.1%}"
        )
        if name == "shipped-d-tilt":
            for r in rows:
                print(f"   d={r[0]} {r[1]:10s} {r[2]:+.1%}")


if __name__ == "__main__":
    main()
