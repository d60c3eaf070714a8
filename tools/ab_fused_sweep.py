#!/usr/bin/env python
"""HISTORICAL (round 4): fused-vs-separate tokenization across group counts.

The fused kernel lost at every tested scale and was DELETED (see
tools/artifacts/ab_fused_r04.json for the deciding data); this script no
longer runs at HEAD and is kept as the record of the method.

Round 3's flagship A/B (G=135, tools/ab_fused_compact.py) measured the
separate path faster (16.4 vs 21.0 ms/8MP). This sweep decides the fused
kernel's fate: if no G regime (nor the batch shape) favors
tokenize_compact, it gets deleted rather than maintained behind
JXL_TOKENIZE_FUSED.

Method: build the full 8MP analysis front once (kernel F inputs), then
slice/tile the per-group arrays to G groups and time both tokenization
tails under jit with n-fold lax.scan slope timing (device cost per
application, tunnel RT cancelled).

Usage: python tools/ab_fused_sweep.py [--json tools/artifacts/ab_fused_r04.json]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(x.ravel()[:1])


def time_fn(fn, inputs, n=4):
    out = fn(*inputs)
    jax.tree.map(sync, out)
    best = 1e9
    for _ in range(n):
        t = time.perf_counter()
        jax.tree.map(sync, fn(*inputs))
        best = min(best, time.perf_counter() - t)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--gs", default="16,64,135,256,512")
    args = ap.parse_args()

    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    cap = 32768

    # Analysis front once, on device (reused for every G by slicing/tiling).
    up = jnp.asarray(u8)
    dim_g = 135

    @jax.jit
    def front(up):
        groups = PJ.extract_groups_device(up).astype(jnp.float32)
        xyb = PJ.to_xyb(groups)
        qf, masking, raw_qf = PJ.adaptive_quant_field(
            xyb, float(distp.distance), float(distp.inv_scale)
        )
        from jxl_tiny_tpu.ops.dct_jax import dct2d

        g = groups.shape[0]
        blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef8 = dct2d(blocks8, 8, 8)
        return xyb, coef8, qf, masking, raw_qf

    yb = np.empty(dim_g, np.int32)
    xb = np.empty(dim_g, np.int32)
    i = 0
    for gy in range(9):
        for gx in range(15):
            yb[i] = -(-min(256, 2160 - gy * 256) // 8)
            xb[i] = -(-min(256, 3840 - gx * 256) // 8)
            i += 1
    ybd, xbd = jnp.asarray(yb), jnp.asarray(xb)

    xyb, coef8, qf, masking, raw_qf0 = front(up)

    @jax.jit
    def middle(xyb, coef8, qf, masking, raw_qf0, ybd, xbd):
        g = coef8.shape[0]
        by_i = jnp.arange(32)[:, None]
        bx_i = jnp.arange(32)[None, :]
        valid = (by_i[None] < ybd[:, None, None]) & (
            bx_i[None] < xbd[:, None, None]
        )
        ytox, ytob = PJ.compute_cmap(coef8, valid)
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, float(distp.distance),
            ybd, xbd,
        )
        raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf0)
        return ytox, ytob, strategy, is_first, coef_v, coef_h, raw_qf, valid

    mids = middle(xyb, coef8, qf, masking, raw_qf0, ybd, xbd)
    ytox, ytob, strategy, is_first, coef_v, coef_h, raw_qf, valid = mids
    jax.tree.map(sync, mids)

    def take(a, g):
        reps = -(-g // a.shape[0])
        return jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:g]

    rows = []
    for g in [int(v) for v in args.gs.split(",")]:
        ins = tuple(
            take(a, g)
            for a in (coef8, coef_v, coef_h, strategy, is_first, raw_qf,
                      ytox, ytob, valid)
        )

        def run(fused):
            os.environ.pop("JXL_TOKENIZE_FUSED", None)
            if fused:
                os.environ["JXL_TOKENIZE_FUSED"] = "1"

            @jax.jit
            def tail(coef8, coef_v, coef_h, strategy, is_first, raw_qf,
                     ytox, ytob, valid):
                return PJ.encode_groups_stream(
                    coef8, coef_v, coef_h, strategy, is_first, raw_qf,
                    ytox, ytob, float(distp.scale), float(distp.scale_dc),
                    float(distp.x_qm_mul), valid, cap,
                )

            best, out = time_fn(tail, ins)
            os.environ.pop("JXL_TOKENIZE_FUSED", None)
            return best, out

        t_sep, out_sep = run(False)
        t_fus, out_fus = run(True)
        ok = bool(
            np.array_equal(np.asarray(out_sep[0]), np.asarray(out_fus[0]))
            and np.array_equal(np.asarray(out_sep[1]), np.asarray(out_fus[1]))
        )
        row = dict(
            g=g, sep_ms=round(t_sep * 1e3, 2), fused_ms=round(t_fus * 1e3, 2),
            fused_faster=bool(t_fus < t_sep), byte_identical=ok,
        )
        rows.append(row)
        print(row, flush=True)

    out = dict(
        image="photo8mp front tiled to G groups", cap=cap, rows=rows,
        note="times include one tunnel RT each (same for both variants); "
             "the sign of (fused - sep) is the decision signal",
    )
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            f.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
