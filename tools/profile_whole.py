#!/usr/bin/env python
"""Whole-program stage attribution for the flagship 8MP encode (round 4,
VERDICT task 1).

Methodology: PREFIX DELTAS. Program A is re-jitted 13 times as successive
prefixes of the real composition (same inputs, same data); prefix k returns
one f32 scalar that sums every stage output computed so far, so XLA cannot
dead-code-eliminate any stage while everything else about the program (fusion
inside and across stage seams, layouts, live ranges) matches the shipped
program. The per-stage cost is the *delta* between consecutive prefixes, and
the deltas sum to the full program's time BY CONSTRUCTION — the ledger
reconciles exactly, unlike isolated-stage slope microbenches (bench_back.py),
which measure each stage with cold HBM inputs and no fusion context and
overcounted round 3's stage wins by ~3x (see tools/artifacts/profile_r04.md).

The forcing scalar costs one extra HBM read of each stage's outputs per
prefix (~0.1-0.3 ms for the 212 MB intermediates); identical in consecutive
prefixes, so it cancels in every delta except the new stage's own.

jax.profiler over the axon tunnel is NOT used by default: a start_trace
attempt wedged the remote end during this round's window (2026-08-20).
Pass --trace to try it anyway.

Usage (hardware window): python tools/profile_whole.py [--json out.json]
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
    """DCE-proof forcing scalar: full-read sum of every array."""
    tot = jnp.float32(0)
    for a in arrs:
        tot = tot + jnp.sum(a.astype(jnp.float32))
    return tot


def build_prefixes(distp, cap, ysize, xsize):
    """Returns [(name, fn(up, yb, xb) -> f32 scalar)], the composition of
    pipeline_jax.analyze_image_packed split at its stage seams."""
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu.ops.pack_kernels import (
        compact_stream, hist_base64, rows_from_tokens,
    )
    from jxl_tiny_tpu.ops.tokenize_kernel import tokenize_cells

    F = dict(
        distance=float(distp.distance), inv_scale=float(distp.inv_scale),
        scale=float(distp.scale), scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul),
    )

    # Each stage: (name, fn(state) -> (forcing_args, state_updates)).
    # State accumulates named intermediates exactly as the shipped
    # analyze_image_packed wires them.
    def s_extract(st):
        groups = PJ.extract_groups_device(st["up"])
        return (groups,), dict(groups=groups)

    def s_xyb(st):
        xyb = PJ.to_xyb(st["groups"])
        return (xyb,), dict(xyb=xyb)

    def s_aq(st):
        qf, masking, raw_qf0 = PJ.adaptive_quant_field(
            st["xyb"], F["distance"], F["inv_scale"]
        )
        return (qf, masking, raw_qf0), dict(
            qf=qf, masking=masking, raw_qf0=raw_qf0
        )

    def s_dct8(st):
        g = st["groups"].shape[0]
        blocks8 = st["xyb"].reshape(g, 3, 32, 8, 32, 8).transpose(
            0, 1, 2, 4, 3, 5
        )
        coef8 = dct2d(blocks8, 8, 8)
        by_i = jnp.arange(32)[:, None]
        bx_i = jnp.arange(32)[None, :]
        valid = (by_i[None] < st["yb"][:, None, None]) & (
            bx_i[None] < st["xb"][:, None, None]
        )
        return (coef8,), dict(coef8=coef8, valid=valid)

    def s_cmap(st):
        ytox, ytob = PJ.compute_cmap(st["coef8"], st["valid"])
        return (ytox, ytob), dict(ytox=ytox, ytob=ytob)

    def s_strategy(st):
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            st["xyb"], st["coef8"], st["qf"], st["masking"], st["ytox"],
            st["ytob"], F["distance"], st["yb"], st["xb"],
        )
        return (strategy, is_first, coef_v, coef_h), dict(
            strategy=strategy, is_first=is_first, coef_v=coef_v,
            coef_h=coef_h,
        )

    def s_adjqf(st):
        raw_qf = PJ.adjust_quant_field(
            st["strategy"], st["is_first"], st["raw_qf0"]
        )
        return (raw_qf,), dict(raw_qf=raw_qf)

    def s_middle(st):
        first = st["is_first"] & st["valid"]
        m = PJ._encode_middle(
            st["coef8"], st["coef_v"], st["coef_h"], st["strategy"],
            st["is_first"], st["raw_qf"], st["ytox"], st["ytob"],
            F["scale"], F["scale_dc"], F["x_qm_mul"], first,
        )
        return (
            m["ordered"], m["nzeros_total"], m["nzero_ctx"], m["quant_dc"]
        ), dict(m=m, first=first)

    def s_tokenize(st):
        m = st["m"]
        g = st["groups"].shape[0]
        shp = m["nzeros_total"].shape
        covered_b = jnp.broadcast_to(m["covered"][:, None], shp)
        first_b = jnp.broadcast_to(st["first"][:, None], shp)
        chan = jnp.asarray(PJ._EMIT_CHAN)

        def em(a):
            return a[:, chan].transpose(0, 2, 3, 1)

        tokens_em, count_em = tokenize_cells(
            m["ordered"], em(covered_b), em(m["nzeros_total"]),
            em(m["block_ctx"]), em(m["nzero_ctx"]), em(m["prev_init"]),
            em(first_b),
        )
        return (tokens_em, count_em), dict(
            tokens_em=tokens_em.reshape(g, -1, 128),
            count_em=count_em.reshape(g, -1),
        )

    def s_compact(st):
        from jxl_tiny_tpu.ops.pack_kernels import compact_stream_hier

        compact = (
            compact_stream
            if os.environ.get("JXL_COMPACT_HIER", "1") == "0"
            else compact_stream_hier
        )
        stream, totals = compact(st["tokens_em"], st["count_em"], cap)
        return (stream, totals), dict(stream=stream, totals=totals)

    def s_hist(st):
        hist = hist_base64(
            st["stream"][:, :cap], jnp.minimum(st["totals"], cap)
        )
        return (hist,), dict(hist=hist)

    def s_meta(st):
        m = st["m"]
        meta = PJ._pack_meta_u8(
            m["quant_dc"], st["raw_qf"], st["strategy"], st["is_first"],
            st["ytox"], st["ytob"],
        )
        return (meta,), dict(meta=meta)

    def s_dc_layout(st):
        m = st["m"]
        dc_layout, dchist = PJ.dc_layout_from_maps(
            m["quant_dc"], st["raw_qf"], st["strategy"], st["is_first"],
            st["ytox"], st["ytob"], ysize=ysize, xsize=xsize,
        )
        return (dc_layout, dchist), dict()

    stages = [
        ("extract+linearize", s_extract),
        ("to_xyb", s_xyb),
        ("aq_field", s_aq),
        ("dct8", s_dct8),
        ("cmap", s_cmap),
        ("ac_strategy(+dct16x2)", s_strategy),
        ("adjust_qf", s_adjqf),
        ("quantize middle (kernel F)", s_middle),
        ("tokenize_cells", s_tokenize),
        ("compact_stream", s_compact),
        ("hist_base64", s_hist),
        ("meta_pack", s_meta),
        ("dc_layout(+dc_hist)", s_dc_layout),
    ]

    prefixes = []
    for k in range(1, len(stages) + 1):
        sub = stages[:k]

        def fn(up, yb, xb, _sub=sub):
            st = dict(up=up, yb=yb, xb=xb)
            force = jnp.float32(0)
            for _, s in _sub:
                args, upd = s(st)
                st.update(upd)
                force = force + _fsum(*args)
            return force

        prefixes.append((stages[k - 1][0], jax.jit(fn)))
    return prefixes


def time_fn(fn, args, n=4, sync=lambda o: np.asarray(o)):
    out = fn(*args)
    sync(out)  # compile + warm
    best = 1e9
    for _ in range(n):
        t = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--trace", action="store_true",
                    help="also try jax.profiler (may wedge the axon tunnel)")
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--size", default=None,
                    help="HxW crop for smoke tests (e.g. 512x512)")
    args = ap.parse_args()

    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    import bench

    img = bench._load_image()
    if args.size:
        h, w = (int(v) for v in args.size.split("x"))
        img = img[:, :h, :w]
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    cap = 32768
    ys, xs = img.shape[1], img.shape[2]

    up = jnp.asarray(u8)
    from jxl_tiny_tpu.common import ImageDim, div_ceil

    dim = ImageDim(xs, ys)
    g = dim.num_groups
    yb = np.empty(g, np.int32)
    xb = np.empty(g, np.int32)
    i = 0
    for gy in range(dim.ysize_groups):
        for gx in range(dim.xsize_groups):
            yb[i] = div_ceil(min(256, ys - gy * 256), 8)
            xb[i] = div_ceil(min(256, xs - gx * 256), 8)
            i += 1
    yb = jnp.asarray(yb)
    xb = jnp.asarray(xb)
    np.asarray(up.ravel()[:1])

    # Tunnel round-trip (same method as bench.py) to report both raw and
    # RT-subtracted times; deltas are RT-free either way.
    rts = []
    for _ in range(6):
        t = time.perf_counter()
        np.asarray(up.ravel()[:1])
        rts.append(time.perf_counter() - t)
    rt = min(rts)

    rows = []
    prev = 0.0
    for name, fn in build_prefixes(distp, cap, ys, xs):
        best = time_fn(fn, (up, yb, xb), n=args.n)
        delta = best - prev
        rows.append(dict(stage=name, prefix_ms=round(best * 1e3, 2),
                         delta_ms=round(delta * 1e3, 2)))
        prev = best
        print(f"{name:28s} prefix {best*1e3:7.2f} ms   delta {delta*1e3:7.2f} ms",
              flush=True)

    total_a = prev
    print(f"{'PROGRAM A total':28s} {total_a*1e3:7.2f} ms "
          f"(incl. 1 tunnel RT {rt*1e3:.1f} ms)", flush=True)

    # Program B on real A outputs, via the shipped job orchestration.
    from jxl_tiny_tpu.encoder import DeviceEncodeJob

    job = DeviceEncodeJob(u8, 1.0)
    job.pack()
    np.asarray(job.out_small[:1])
    b_times = []
    for _ in range(args.n):
        t = time.perf_counter()
        job._dispatch_b()
        np.asarray(job.out_small[:1])
        b_times.append(time.perf_counter() - t)
    total_b = min(b_times)
    print(f"{'PROGRAM B total':28s} {total_b*1e3:7.2f} ms", flush=True)

    result = dict(
        image="photo8mp 3840x2160 u8", cap=cap, tunnel_rt_ms=round(rt * 1e3, 2),
        program_a_ms=round(total_a * 1e3, 2),
        program_a_compute_ms=round((total_a - rt) * 1e3, 2),
        program_b_ms=round(total_b * 1e3, 2),
        program_b_compute_ms=round((total_b - rt) * 1e3, 2),
        stages=rows,
        note="prefix deltas; each prefix returns one f32 scalar so only one "
             "tunnel RT rides every measurement and cancels in deltas",
    )
    out = json.dumps(result, indent=1)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")

    if args.trace:
        from jxl_tiny_tpu.utils.profiling import profile_trace

        with profile_trace("/tmp/jxl_whole_trace") as d:
            job._dispatch_b()
            np.asarray(job.out_small[:1])
        print("trace at", d)


if __name__ == "__main__":
    main()
