#!/usr/bin/env python
"""HISTORICAL (round 4) — does not run at HEAD: the Pallas hist kernel it
A/Bs was deleted after losing the comparison, and its timing loop turned
out to sync one tunnel RT per output (see the prefix-delta tools for the
valid methodology). Kept as the record of the experiment.

Round-4 optimization experiments, batch A (run on hardware):

  1. hist_base64: new Pallas kernel vs jnp einsum — exact match + time
  2. compact_stream order: argsort vs cumsum+scatter partition — time
  3. compute_ac_strategy combine tail: what costs 3.37 ms — sub-deltas

Usage: python tools/exp_r04a.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def sync(x):
    np.asarray(jnp.ravel(x)[:1])


def timeit(name, fn, *args, n=4):
    out = fn(*args)
    jax.tree.map(sync, out)
    best = 1e9
    for _ in range(n):
        t = time.perf_counter()
        jax.tree.map(sync, fn(*args))
        best = min(best, time.perf_counter() - t)
    print(f"{name:44s} {best*1e3:8.2f} ms", flush=True)
    return best, out


def main():
    from jxl_tiny_tpu.common import compute_distance_params
    from jxl_tiny_tpu.io.color import linear_to_srgb_u8
    from jxl_tiny_tpu.ops import pipeline_jax as PJ
    from jxl_tiny_tpu.ops.dct_jax import dct2d
    from jxl_tiny_tpu.ops import pack_kernels as PK
    import bench

    img = bench._load_image()
    u8 = linear_to_srgb_u8(img)
    distp = compute_distance_params(1.0)
    distance = float(distp.distance)
    cap = 32768
    g = 135

    yb = np.empty(g, np.int32)
    xb = np.empty(g, np.int32)
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
    sync(qf)

    # Real stream for the hist experiment.
    @jax.jit
    def to_stream(xyb, coef8, qf, masking, raw_qf0, valid, ytox, ytob):
        strategy, is_first, coef_v, coef_h = PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, distance, ybd, xbd
        )
        raw_qf = PJ.adjust_quant_field(strategy, is_first, raw_qf0)
        stream, totals, quant_dc = PJ.encode_groups_stream(
            coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            float(distp.scale), float(distp.scale_dc), float(distp.x_qm_mul),
            valid, cap,
        )
        return stream[:, :cap], jnp.minimum(totals, cap)

    stream, totals = to_stream(xyb, coef8, qf, masking, raw_qf0, valid,
                               ytox, ytob)
    sync(totals)

    # ---- 1. hist kernel vs einsum --------------------------------------
    t_k, h_k = timeit("hist pallas kernel", jax.jit(PK.hist_base64),
                      stream, totals)
    t_e, h_e = timeit("hist jnp einsum", jax.jit(PK._hist_base64_jnp),
                      stream, totals)
    exact = bool(np.array_equal(np.asarray(h_k), np.asarray(h_e)))
    print(f"hist exact match: {exact}  (sum {int(np.asarray(h_k).sum())})",
          flush=True)
    assert exact

    # ---- 2. order construction -----------------------------------------
    rows_cnt = jnp.asarray(
        (np.random.RandomState(0).rand(g, 3072) < 0.47)
        * np.random.RandomState(1).randint(1, 60, (g, 3072))
    ).astype(jnp.int32)

    @jax.jit
    def order_argsort(cnt):
        return jnp.argsort(cnt == 0, axis=1, stable=True).astype(jnp.int32)

    @jax.jit
    def order_scatter(cnt):
        nrows = cnt.shape[1]
        ne = cnt > 0
        nb = ne.sum(axis=1)
        pos_ne = jnp.cumsum(ne, axis=1) - 1
        pos_e = nb[:, None] + jnp.cumsum(~ne, axis=1) - 1
        dest = jnp.where(ne, pos_ne, pos_e).astype(jnp.int32)
        r_idx = jnp.broadcast_to(
            jnp.arange(nrows, dtype=jnp.int32), cnt.shape
        )
        return (
            jnp.zeros(cnt.shape, jnp.int32)
            .at[jnp.arange(cnt.shape[0])[:, None], dest]
            .set(r_idx, unique_indices=True, mode="promise_in_bounds")
        )

    _, o_a = timeit("order argsort (current)", order_argsort, rows_cnt)
    _, o_s = timeit("order cumsum+scatter", order_scatter, rows_cnt)
    cnt_np = np.asarray(rows_cnt)
    nb_np = (cnt_np > 0).sum(axis=1)
    oa, osc = np.asarray(o_a), np.asarray(o_s)
    ok = all(
        np.array_equal(oa[k, : nb_np[k]], osc[k, : nb_np[k]])
        for k in range(g)
    )
    print(f"order match on first nb entries: {ok}", flush=True)

    # ---- 3. combine tail sub-deltas ------------------------------------
    from jxl_tiny_tpu.ops.strategy_kernel import (
        combine_partials, estimate_partials,
    )
    from jxl_tiny_tpu import constants as C

    F32 = np.float32
    qm8 = jnp.asarray(C.QUANT_DCT8.reshape(3, 64))
    qm16 = jnp.asarray(C.QUANT_DCT16.reshape(3, 128))
    slope = min(1.0, distance / 3.0)

    @jax.jit
    def partials_only(xyb, coef8, qf, ytox, ytob):
        fac_x = jnp.repeat(jnp.repeat(ytox.astype(jnp.float32), 8, 1),
                           8, 2) * C.INV_COLOR_FACTOR
        fac_b = 1.0 + jnp.repeat(
            jnp.repeat(ytob.astype(jnp.float32), 8, 1), 8, 2
        ) * C.INV_COLOR_FACTOR
        blk_v = xyb.reshape(g, 3, 16, 16, 32, 8).transpose(0, 1, 2, 4, 3, 5)
        coef_v = dct2d(blk_v, 16, 8).reshape(g, 3, 16, 32, 128)
        blk_h = xyb.reshape(g, 3, 32, 8, 16, 16).transpose(0, 1, 2, 4, 3, 5)
        coef_h = dct2d(blk_h, 8, 16).reshape(g, 3, 32, 16, 128)
        q_v = jnp.maximum(qf[:, ::2], qf[:, 1::2])
        q_h = jnp.maximum(qf[:, :, ::2], qf[:, :, 1::2])
        p8, pv, ph = estimate_partials(
            coef8.reshape(g, 3, 32, 32, 64), coef_v, coef_h, qf, q_v, q_h,
            jnp.stack([fac_x, fac_b], axis=1),
            jnp.stack([fac_x[:, ::2], fac_b[:, ::2]], axis=1),
            jnp.stack([fac_x[:, :, ::2], fac_b[:, :, ::2]], axis=1),
            qm8, qm16, slope,
        )
        return p8, pv, ph, coef_v, coef_h

    p8, pv, ph, coef_v, coef_h = partials_only(xyb, coef8, qf, ytox, ytob)
    sync(p8)

    @jax.jit
    def tail_only(p8, pv, ph, masking, qf):
        m_v = jnp.maximum(masking[:, ::2], masking[:, 1::2])
        m_h = jnp.maximum(masking[:, :, ::2], masking[:, :, 1::2])
        mul8 = F32(1.0735757687292623 * 0.75
                   + (-0.55 * 0.75) / (distance + 1.4))
        mul16 = F32(0.9019587899705066 + (-0.55) / (distance + 1.6))
        e8_all = F32(3.0) * mul8 + mul8 * combine_partials(p8, masking, 1)
        ev_all = mul16 * combine_partials(pv, m_v, 2)
        eh_all = mul16 * combine_partials(ph, m_h, 2)
        e00 = e8_all[:, ::2, ::2]
        e01 = e8_all[:, ::2, 1::2]
        e10 = e8_all[:, 1::2, ::2]
        e11 = e8_all[:, 1::2, 1::2]
        ev_l = ev_all[:, :, ::2]
        ev_r = ev_all[:, :, 1::2]
        eh_t = eh_all[:, ::2, :]
        eh_b = eh_all[:, 1::2, :]
        cost16x8 = jnp.minimum(ev_l, e00 + e10) + jnp.minimum(ev_r, e01 + e11)
        cost8x16 = jnp.minimum(eh_t, e00 + e01) + jnp.minimum(eh_b, e10 + e11)
        pick_v = cost16x8 < cost8x16
        qi = jnp.arange(16)
        quad_ok = (
            (2 * qi[None, :, None] + 2 <= ybd[:, None, None])
            & (2 * qi[None, None, :] + 2 <= xbd[:, None, None])
        )
        v_l = quad_ok & pick_v & (ev_l < e00 + e10)
        v_r = quad_ok & pick_v & (ev_r < e01 + e11)
        h_t = quad_ok & ~pick_v & (eh_t < e00 + e01)
        h_b = quad_ok & ~pick_v & (eh_b < e10 + e11)
        vfirst = jnp.zeros((g, 32, 32), bool)
        vfirst = vfirst.at[:, ::2, ::2].set(v_l)
        vfirst = vfirst.at[:, ::2, 1::2].set(v_r)
        hfirst = jnp.zeros((g, 32, 32), bool)
        hfirst = hfirst.at[:, ::2, ::2].set(h_t)
        hfirst = hfirst.at[:, 1::2, ::2].set(h_b)
        return vfirst, hfirst

    timeit("combine tail alone (maps only)", tail_only, p8, pv, ph,
           masking, qf)

    @jax.jit
    def full_strategy(xyb, coef8, qf, masking, ytox, ytob):
        return PJ.compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, distance, ybd, xbd
        )

    timeit("FULL compute_ac_strategy", full_strategy, xyb, coef8, qf,
           masking, ytox, ytob)
    timeit("partials_only (dcts+kernel)", partials_only, xyb, coef8, qf,
           ytox, ytob)


if __name__ == "__main__":
    main()
