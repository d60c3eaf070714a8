#!/usr/bin/env python
"""Sub-stage prefix-delta attribution inside the two hottest stages of the
round-4 whole-program trace (tools/artifacts/profile_r04.md):

  ac_strategy 9.35 ms  -> dct16_v | dct16_h | estimate_partials | combine+pick
  compact     7.67 ms  -> merge_rows | argsort+meta | pallas placement

Same methodology as profile_whole.py, with real mid-pipeline inputs
materialized once on device (so prefixes measure the stage's internal
composition; the stage-boundary fusion context is what the whole-program
trace already charged).

Usage: python tools/profile_fine.py [--json tools/artifacts/profile_fine_r04.json]
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


def _fsum(*arrs):
    tot = jnp.float32(0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(jnp.float32))
    return tot


def time_fn(fn, args, n=4):
    out = fn(*args)
    np.asarray(out)
    best = 1e9
    for _ in range(n):
        t = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t)
    return best


def run_prefixes(title, stages, args_dev, n):
    rows = []
    prev = 0.0
    for k in range(1, len(stages) + 1):
        sub = stages[:k]

        def fn(*a, _sub=sub):
            st = dict(zip(ARG_NAMES[title], a))
            force = jnp.float32(0)
            for _, s in _sub:
                outs, upd = s(st)
                st.update(upd)
                force = force + _fsum(*outs)
            return force

        best = time_fn(jax.jit(fn), args_dev, n=n)
        delta = best - prev
        rows.append(dict(stage=stages[k - 1][0],
                         prefix_ms=round(best * 1e3, 2),
                         delta_ms=round(delta * 1e3, 2)))
        prev = best
        print(f"[{title}] {stages[k-1][0]:26s} prefix {best*1e3:7.2f} ms  "
              f"delta {delta*1e3:7.2f} ms", flush=True)
    return rows


ARG_NAMES = {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu import constants as C
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    distance = float(distp.distance)
    cap = 32768

    g_n = 135
    yb = np.empty(g_n, np.int32)
    xb = np.empty(g_n, np.int32)
    i = 0
    for gy in range(9):
        for gx in range(15):
            yb[i] = -(-min(256, 2160 - gy * 256) // 8)
            xb[i] = -(-min(256, 3840 - gx * 256) // 8)
            i += 1
    ybd, xbd = jnp.asarray(yb), jnp.asarray(xb)

    @jax.jit
    def front(up):
        groups = PJ.extract_groups_device(up).astype(jnp.float32)
        xyb = PJ.to_xyb(groups)
        qf, masking, raw_qf = PJ.adaptive_quant_field(
            xyb, distance, float(distp.inv_scale)
        )
        g = groups.shape[0]
        blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef8 = dct2d(blocks8, 8, 8)
        by_i = jnp.arange(32)[:, None]
        bx_i = jnp.arange(32)[None, :]
        valid = (by_i[None] < ybd[:, None, None]) & (
            bx_i[None] < xbd[:, None, None]
        )
        ytox, ytob = PJ.compute_cmap(coef8, valid)
        return xyb, coef8, qf, masking, raw_qf, valid, ytox, ytob

    up = jnp.asarray(u8)
    xyb, coef8, qf, masking, raw_qf0, valid, ytox, ytob = front(up)
    np.asarray(qf.ravel()[:1])

    results = {}

    # ---------------- strategy sub-stages ----------------
    from jxl_tiny_tpu.ops.strategy_kernel import (
        combine_partials, estimate_partials,
    )

    F32 = np.float32
    g = g_n
    qm8 = jnp.asarray(C.QUANT_DCT8.reshape(3, 64))
    qm16 = jnp.asarray(C.QUANT_DCT16.reshape(3, 128))
    slope = min(1.0, distance / 3.0)
    mul8 = F32(1.0735757687292623 * 0.75 + (-0.55 * 0.75) / (distance + 1.4))
    mul16 = F32(0.9019587899705066 + (-0.55) / (distance + 1.6))

    def s_dctv(st):
        x = st["xyb"]
        blk_v = x.reshape(g, 3, 16, 16, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef_v = dct2d(blk_v, 16, 8).reshape(g, 3, 16, 32, 128)
        return (coef_v,), dict(coef_v=coef_v)

    def s_dcth(st):
        x = st["xyb"]
        blk_h = x.reshape(g, 3, 32, 8, 16, 16).transpose(0, 1, 2, 4, 3, 5)
        coef_h = dct2d(blk_h, 8, 16).reshape(g, 3, 32, 16, 128)
        return (coef_h,), dict(coef_h=coef_h)

    def s_partials(st):
        fac_x = jnp.repeat(jnp.repeat(st["ytox"].astype(jnp.float32), 8, 1),
                           8, 2) * C.INV_COLOR_FACTOR
        fac_b = 1.0 + jnp.repeat(
            jnp.repeat(st["ytob"].astype(jnp.float32), 8, 1), 8, 2
        ) * C.INV_COLOR_FACTOR
        q_v = jnp.maximum(st["qf"][:, ::2], st["qf"][:, 1::2])
        q_h = jnp.maximum(st["qf"][:, :, ::2], st["qf"][:, :, 1::2])
        p8, pv, ph = estimate_partials(
            st["coef8"].reshape(g, 3, 32, 32, 64), st["coef_v"],
            st["coef_h"], st["qf"], q_v, q_h,
            jnp.stack([fac_x, fac_b], axis=1),
            jnp.stack([fac_x[:, ::2], fac_b[:, ::2]], axis=1),
            jnp.stack([fac_x[:, :, ::2], fac_b[:, :, ::2]], axis=1),
            qm8, qm16, slope,
        )
        return (p8, pv, ph), dict(p8=p8, pv=pv, ph=ph)

    def s_combine(st):
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            st["xyb"], st["coef8"], st["qf"], st["masking"], st["ytox"],
            st["ytob"], distance, ybd, xbd,
        )
        return (strategy, is_first), dict()

    ARG_NAMES["strategy"] = ["xyb", "coef8", "qf", "masking", "ytox", "ytob"]
    results["strategy"] = run_prefixes(
        "strategy",
        [("dct16_v", s_dctv), ("dct16_h", s_dcth),
         ("estimate_partials", s_partials),
         ("FULL compute_ac_strategy", s_combine)],
        (xyb, coef8, qf, masking, ytox, ytob), args.n,
    )

    # ---------------- tokenize/compact sub-stages ----------------
    strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
        xyb, coef8, qf, masking, ytox, ytob, distance, ybd, xbd
    )
    raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf0)
    first = is_first & valid

    @jax.jit
    def mid(coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            first):
        m = PJ._encode_middle(
            coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            float(distp.scale), float(distp.scale_dc), float(distp.x_qm_mul),
            first,
        )
        shp = m["nzeros_total"].shape
        covered_b = jnp.broadcast_to(m["covered"][:, None], shp)
        first_b = jnp.broadcast_to(first[:, None], shp)
        chan = jnp.asarray(PJ._EMIT_CHAN)

        def em(a):
            return a[:, chan].transpose(0, 2, 3, 1)

        from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_cells

        tokens_em, count_em = tokenize_cells(
            m["ordered"], em(covered_b), em(m["nzeros_total"]),
            em(m["block_ctx"]), em(m["nzero_ctx"]), em(m["prev_init"]),
            em(first_b),
        )
        return tokens_em.reshape(g, -1, 128), count_em.reshape(g, -1)

    rows_tok, rows_cnt = mid(coef8, coef_v, coef_h, strategy, is_first,
                             raw_qf, ytox, ytob, first)
    np.asarray(rows_cnt.ravel()[:1])

    from jxl_tiny_tpu.ops.pack_kernels import (
        W, _compact_kernel, merge_rows,
    )
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jxl_tiny_tpu.ops.pack_kernels import _interpret

    def s_merge(st):
        tok, starts, cnt, totals = merge_rows(st["rows_tok"], st["rows_cnt"], 6)
        return (tok, starts, cnt, totals), dict(
            tok=tok, starts=starts, cnt=cnt, totals=totals
        )

    def s_meta(st):
        cnt = st["cnt"]
        nrows = st["tok"].shape[1]
        order = jnp.argsort(cnt == 0, axis=1, stable=True).astype(jnp.int32)
        nb = jnp.broadcast_to(
            (cnt > 0).sum(axis=1)[:, None], (g, nrows)
        ).astype(jnp.int32)
        meta = jnp.stack([st["starts"], cnt, order, nb], axis=1)
        return (meta,), dict(meta=meta)

    def s_place(st):
        nrows = st["tok"].shape[1]
        stream = pl.pallas_call(
            functools.partial(_compact_kernel, cap=cap),
            grid=(g,),
            in_specs=[
                pl.BlockSpec((1, 4, nrows), lambda i: (i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, nrows, W), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cap + W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((g, 1, cap + W), jnp.uint32),
            interpret=_interpret(),
        )(st["meta"], st["tok"])
        return (stream,), dict()

    ARG_NAMES["compact"] = ["rows_tok", "rows_cnt"]
    results["compact"] = run_prefixes(
        "compact",
        [("merge_rows(4 levels)", s_merge), ("argsort+meta", s_meta),
         ("pallas placement", s_place)],
        (rows_tok, rows_cnt), args.n,
    )

    # row-statistics the merge/placement cost depends on
    cnt_np = np.asarray(rows_cnt)
    tok, starts, cnt_m, totals = jax.jit(
        lambda a, b: merge_rows(a, b, 6)
    )(rows_tok, rows_cnt)
    nb_all = np.asarray((np.asarray(cnt_m) > 0).sum(axis=1))
    results["row_stats"] = dict(
        rows_per_group=int(cnt_np.shape[1]),
        nonempty_pre_merge=float((cnt_np > 0).sum(axis=1).mean()),
        nonempty_post_merge=float(nb_all.mean()),
        nonempty_post_merge_max=int(nb_all.max()),
        tokens_per_group_mean=float(cnt_np.sum(axis=1).mean()),
    )
    print(results["row_stats"], flush=True)

    out = json.dumps(results, indent=1)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
