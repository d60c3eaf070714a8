#!/usr/bin/env python
"""Decompose program A's back half + program B on real hardware.

Slope-times (K=1 vs 3 repeats inside one jit) the flagship stages that
bench_analysis.py does not cover: the Pallas quantize front-end, both
tokenize route (kernel F + tokenize_cells + compact_stream),
histograms, DC layout, and the AC/DC section packers. Run during a
hardware window."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    np.asarray(x.ravel()[:1])


def slope(name, make_fn, *inputs, ks=(1, 3)):
    ts = {}
    for k in ks:
        fn = jax.jit(make_fn(k))
        fn(*inputs)
        best = 1e9
        for _ in range(3):
            t = time.perf_counter()
            sync(fn(*inputs))
            best = min(best, time.perf_counter() - t)
        ts[k] = best
    dev = (ts[ks[1]] - ts[ks[0]]) / (ks[1] - ks[0])
    print(f"{name:36s} {dev*1e3:8.2f} ms/app  (K1 {ts[ks[0]]*1e3:.1f})")
    return dev


def mk(op):
    """Repeat op(carry, *args) k times inside one jit."""

    def make(k):
        def f(*args):
            def body(c, _):
                return op(c, *args), ()

            c, _ = lax.scan(body, jnp.float32(0), None, length=k)
            return c

        return f

    return make


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops import dc_kernels as DK
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu.ops.pack_kernels import (
        compact_stream, hist_base64, pack_ac_sections, rows_from_tokens,
    )
    from jxl_tiny_tpu.ops.quantize_kernel import quantize_cells
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    F = dict(
        scale=float(distp.scale), scale_dc=float(distp.scale_dc),
        x_qm_mul=float(distp.x_qm_mul), distance=float(distp.distance),
        inv_scale=float(distp.inv_scale),
    )
    cap = 16384

    groups = jax.jit(PJ.extract_groups_device)(jnp.asarray(u8))
    groups = jnp.asarray(np.asarray(groups).astype(np.float32))
    g = groups.shape[0]
    yb = jnp.full((g,), 32, jnp.int32)
    xb = jnp.full((g,), 32, jnp.int32)
    print(f"g={g}")

    @jax.jit
    def front(groups):
        xyb = PJ.to_xyb(groups)
        qf, masking, raw_qf = PJ.adaptive_quant_field(
            xyb, F["distance"], F["inv_scale"]
        )
        blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef8 = dct2d(blocks8, 8, 8)
        by_i = jnp.arange(32)[:, None]
        bx_i = jnp.arange(32)[None, :]
        valid = (by_i[None] < yb[:, None, None]) & (
            bx_i[None] < xb[:, None, None]
        )
        ytox, ytob = PJ.compute_cmap(coef8, valid)
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, F["distance"], yb, xb
        )
        raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf)
        return (xyb, coef8, coef_v, coef_h, strategy, is_first, raw_qf,
                ytox, ytob, valid)

    (xyb, coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
     valid) = [jnp.asarray(np.asarray(a)) for a in front(groups)]

    fac_x = jnp.asarray(np.asarray(
        jnp.repeat(jnp.repeat(ytox.astype(np.float32), 8, 1), 8, 2)
        * np.float32(1.0 / 84)
    ))
    fac_b = jnp.asarray(np.asarray(
        1.0 + jnp.repeat(jnp.repeat(ytob.astype(np.float32), 8, 1), 8, 2)
        * np.float32(1.0 / 84)
    ))

    # --- quantize front-end (kernel F) alone ---
    def quant_op(c, c8, cv, ch):
        o, nz, qdc, ln = quantize_cells(
            c8 + c, cv, ch, strategy, raw_qf, fac_x, fac_b,
            F["scale"], F["scale_dc"], F["x_qm_mul"],
        )
        return c + o[0, 0, 0, 0, 0].astype(jnp.float32)

    slope("quantize_cells (kernel F)", mk(quant_op), coef8, coef_v, coef_h)

    # --- separate route end-to-end: middle + tokenize_cells + compact ---
    # (the fused tokenize_compact kernel and its JXL_TOKENIZE_FUSED switch
    # were deleted in round 4 after losing the hardware A/B; this times the
    # one remaining route, encode_groups_stream, as a whole.)
    def stream_op(c, c8, cv, ch):
        s, t, qdc = PJ.encode_groups_stream(
            c8 + c, cv, ch, strategy, is_first, raw_qf, ytox, ytob,
            F["scale"], F["scale_dc"], F["x_qm_mul"], valid, cap,
        )
        return c + s[0, 0].astype(jnp.float32)

    slope("encode_groups_stream (whole route)", mk(stream_op), coef8, coef_v,
          coef_h)

    # --- separate route: middle + tokenize_cells + rows + compact ---
    def sep_op(c, c8, cv, ch):
        tf, cf, qdc, _ = PJ.encode_groups(
            xyb, c8 + c, cv, ch, strategy, is_first, raw_qf, ytox, ytob,
            F["scale"], F["scale_dc"], F["x_qm_mul"], valid, base_ctx=True,
        )
        rt, rc = rows_from_tokens(tf, cf)
        s, t = compact_stream(rt, rc, cap)
        return c + s[0, 0].astype(jnp.float32)

    slope("encode sep (cells+rows+compact)", mk(sep_op), coef8, coef_v,
          coef_h)

    # --- histogram / DC layout / program B packers on real outputs ---
    s_, t_, qdc_ = jax.jit(
        lambda c8, cv, ch: PJ.encode_groups_stream(
            c8, cv, ch, strategy, is_first, raw_qf, ytox, ytob,
            F["scale"], F["scale_dc"], F["x_qm_mul"], valid, cap,
        )
    )(coef8, coef_v, coef_h)
    stream = jnp.asarray(np.asarray(s_))[:, :cap]
    totals = jnp.asarray(np.asarray(jnp.minimum(t_, cap)))
    quant_dc = jnp.asarray(np.asarray(qdc_))

    def hist_op(c, s, t):
        h = hist_base64(s + c.astype(jnp.uint32), t)
        return c + h[0, 0].astype(jnp.float32)

    slope("hist_base64", mk(hist_op), stream, totals)

    def dc_op(c, qdc):
        lay, dh = PJ.dc_layout_from_maps(
            qdc + c.astype(jnp.int32), raw_qf, strategy, is_first, ytox,
            ytob, ysize=2160, xsize=3840,
        )
        return c + lay[0, 0].astype(jnp.float32) + dh[0, 0].astype(
            jnp.float32
        )

    slope("dc_layout_from_maps (+hist)", mk(dc_op), quant_dc)

    lay, _ = jax.jit(
        lambda qdc: PJ.dc_layout_from_maps(
            qdc, raw_qf, strategy, is_first, ytox, ytob,
            ysize=2160, xsize=3840,
        )
    )(quant_dc)
    lay = jnp.asarray(np.asarray(lay))

    # Factored code table [9, 64] f32 (row 0: ctx->cluster < 8; rows 1..8:
    # per-cluster depth<<16 | code bits). Values shape the packed bits,
    # not the timing.
    tab = np.zeros((9, 64), np.float32)
    tab[0] = np.arange(64) % 8
    depth = 5 + np.arange(64, dtype=np.int64) % 3
    tab[1:] = ((depth << 16) | (np.arange(64, dtype=np.int64) % (1 << 5))).astype(
        np.float32
    )[None]
    d_ac = jnp.asarray(tab)
    ow = 8192
    wcap = 65536

    def pack_ac_op(c, s, t):
        out = pack_ac_sections(s + c.astype(jnp.uint32), t, d_ac, ow, wcap)
        return c + out["words"][0].astype(jnp.float32)

    slope("pack_ac_sections", mk(pack_ac_op), stream, totals)

    def pack_dc_op(c, l):
        out = DK.pack_dc_sections(l + c.astype(jnp.int32), d_ac, ow, wcap)
        return c + out["words"][0].astype(jnp.float32)

    slope("pack_dc_sections", mk(pack_dc_op), lay)


if __name__ == "__main__":
    main()
