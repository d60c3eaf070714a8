"""Fused quantize front-end as one Pallas TPU kernel (kernel F).

The front half of encode_groups (strategy-select of coefficients and
tables, Y quantize + roundtrip bias, CfL-unapply, X/B quantize, DC
extraction, zig-zag reorder, nonzero counts; enc_group.cc:340-456) ran as
~20 XLA passes over 212 MB [G,3,32,32,128] arrays. Everything is local to
a cell's 128-coefficient row, so one kernel does it with one read of the
three DCT coefficient sets and one write of the zig-zag-ordered quantized
values:

  - grid (G, 4): blocks of [8, 32] cells; vertical(16x8) / horizontal
    (8x16) coefficient rows map to halved blocks broadcast back up
  - tables ride as [3,3,128] inputs selected per cell by strategy
  - the zig-zag permutation is two one-hot matmuls (bf16x3-exact) on
    the MXU (exact for integer quantized values), selected per cell
  - per-first-cell DC pairs come out as [G,3,2,32,32]; the cheap
    neighbor scatter stays in jnp on [G,3,32,32] maps

Semantics are bit-equal to the jnp front-end (tested via the pipeline
golden tests)."""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .. import constants as C
from .pack_kernels import _interpret
from .pipeline_jax import _QM_TAB, _DQM_TAB, _THR_TAB, _ZZ_P8, _ZZ_P16

F32 = np.float32

# int8 MXU variant of the zig-zag permutation dots (see _quant_kernel).
import os as _os

_ZZ_INT8 = _os.environ.get("JXL_ZZ_INT8") == "1"


def _quant_kernel(
    c8_ref, cv_ref, chh_ref, st_ref, qf_ref, fx_ref, fb_ref,
    qm_ref, dqm_ref, thr_ref, p8_ref, p16_ref,
    ord_ref, nz_ref, qdc_ref, ln_ref, *, scale, scale_dc, x_qm_mul,
):
    s = st_ref[0]  # [8,32] i32
    quant = qf_ref[0].astype(jnp.float32)
    qac = F32(scale) * quant
    inv_qac = 1.0 / (F32(scale) * quant)
    c2 = s != C.DCT8
    # Bool minor-dim inserts are unsupported in Mosaic — broadcast via i32.
    c2l = (c2.astype(jnp.int32))[..., None] != 0

    def tab(t_ref, ch):
        t8 = t_ref[C.DCT8, ch][None, None, :]
        tv = t_ref[C.DCT16X8, ch][None, None, :]
        th = t_ref[C.DCT8X16, ch][None, None, :]
        sl = s[..., None]
        return jnp.where(
            sl == C.DCT8, t8, jnp.where(sl == C.DCT16X8, tv, th)
        )

    c8 = c8_ref[0]  # [3,8,32,64]
    # [3,4,32,128] natural v-rows -> cell rows x2 (static major-axis
    # slices; both cells of a 16x8 transform read the same coefficients).
    cvn = cv_ref[0]
    cv = jnp.concatenate(
        [cvn[:, k // 2 : k // 2 + 1] for k in range(8)], axis=1
    )  # [3,8,32,128]
    # [3,8,16,128] natural h-cols -> cell cols x2, in-register (the
    # caller used to jnp.repeat this to [G,3,32,32,128] in HBM — a 212 MB
    # materialization on the 8MP image for data the kernel can duplicate
    # from the natural block for free).
    chn = chh_ref[0]
    chh = jnp.concatenate(
        [chn[:, :, j // 2 : j // 2 + 1] for j in range(32)], axis=2
    )  # [3,8,32,128]

    def coefs_ch(ci):
        a8 = jnp.concatenate(
            [c8[ci], jnp.zeros((8, 32, 64), jnp.float32)], axis=-1
        )
        sl = s[..., None]
        return jnp.where(
            sl == C.DCT8, a8, jnp.where(sl == C.DCT16X8, cv[ci], chh[ci])
        )

    bias = C.DEFAULT_QUANT_BIAS

    def quantize(coef, ch, mul):
        # Saturates at C.AC_COEF_CLAMP (see constants/__init__.py) — must
        # match the jnp twin and the numpy golden bit-for-bit.
        val = coef * tab(qm_ref, ch) * (qac * F32(mul))[..., None]
        q = jnp.where(jnp.abs(val) >= tab(thr_ref, ch), jnp.round(val), 0.0)
        return jnp.clip(
            q, -F32(C.AC_COEF_CLAMP), F32(C.AC_COEF_CLAMP)
        ).astype(jnp.int32)

    cy = coefs_ch(1)
    qy = quantize(cy, 1, 1.0)
    qyf = qy.astype(jnp.float32)
    small = jnp.abs(qyf) < 1.125
    one = jnp.where(qy == 0, 0.0, jnp.where(qyf < 0, -F32(bias[1]), F32(bias[1])))
    big = qyf - F32(bias[3]) / jnp.where(qy == 0, 1.0, qyf)
    y_deq = jnp.where(small, one, big) * tab(dqm_ref, 1) * inv_qac[..., None]

    cx = coefs_ch(0) - fx_ref[0][..., None] * y_deq
    cb = coefs_ch(2) - fb_ref[0][..., None] * y_deq
    qx = quantize(cx, 0, x_qm_mul)
    qb = quantize(cb, 2, 1.0)

    def round_away(x):
        return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)

    inv_factor = C.INV_DC_QUANT * F32(scale_dc)
    sc = F32(C.DCT_SCALE_16_TO_2)

    def dc_pair(coef):  # [8,32,128] -> [2,8,32] f32
        c0 = coef[..., 0]
        c1 = coef[..., 1] * sc
        return jnp.stack([jnp.where(c2, c0 + c1, c0), c0 - c1], axis=0)

    dclamp = F32(C.DC_VALUE_CLAMP)

    def dc_clip(v):  # saturate at C.DC_VALUE_CLAMP (constants/__init__.py)
        return jnp.clip(v, -dclamp, dclamp).astype(jnp.int32)

    qdc_y = dc_clip(round_away(dc_pair(cy) * F32(inv_factor[1])))
    qdc_x = dc_clip(round_away(dc_pair(cx) * F32(inv_factor[0])))
    cfl_b = F32(C.INV_DC_QUANT[2] * C.DC_QUANT[1])
    qdc_b = dc_clip(
        round_away(dc_pair(cb) * F32(inv_factor[2]) - qdc_y * cfl_b)
    )
    qdc_ref[0, 0] = qdc_x
    qdc_ref[0, 1] = qdc_y
    qdc_ref[0, 2] = qdc_b

    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 32, 128), 2)
    covered = jnp.where(c2, 2, 1)[..., None]
    in_range = (lanes >= covered) & (lanes < covered * 64)
    ods = [None, None, None]
    for ci, q in ((0, qx), (1, qy), (2, qb)):
        # One-hot permutation matmuls in two exact bf16 8-bit chunks:
        # |q| <= AC_COEF_CLAMP < 2^15, so q + 2^15 fits 16 unsigned bits;
        # each permutation output picks exactly one input, and every
        # permutation row sums to 1, so the bias maps through and is
        # subtracted back. Ints <= 255 are bf16-exact; full-rate MXU
        # instead of the 6-pass HIGHEST f32 path (~2.5 ms/8MP saved).
        # i32 throughout: Mosaic has no u32->bf16 lowering on hardware, and
        # q + 2^15 is non-negative < 2^16 so i32 shifts/masks are exact.
        qb16 = (q + (1 << 15)).reshape(256, 128)

        def perm(p_ref):
            out = jnp.zeros((256, 128), jnp.int32)
            if _ZZ_INT8:
                # Integer MXU path (2x the bf16 rate on v5e), natively
                # exact on every backend — no float rounding anywhere.
                # The biased u16 value rides as three s8-safe chunks
                # (7+7+2 bits): 3 int8-rate dots vs 2 bf16-rate dots =
                # 25% less MXU time for the permutations. Gated by
                # JXL_ZZ_INT8 until the window A/B confirms Mosaic
                # lowers s8 dots profitably.
                p8i = p_ref[...].astype(jnp.int8)
                for base in (0, 7, 14):
                    mask = 0x3 if base == 14 else 0x7F
                    piece = (qb16 >> base) & mask
                    part = jax.lax.dot_general(
                        piece.astype(jnp.int8), p8i,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    out = out | (part << base)
                return (out - (1 << 15)).reshape(8, 32, 128)
            for sh8 in (0, 8):
                part = jax.lax.dot_general(
                    ((qb16 >> sh8) & 0xFF).astype(jnp.float32).astype(
                        jnp.bfloat16
                    ), p_ref[...],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                out = out | (part.astype(jnp.int32) << sh8)
            return (out - (1 << 15)).reshape(8, 32, 128)

        o8 = perm(p8_ref)
        o16 = perm(p16_ref)
        od = jnp.where(c2l, o16, o8)
        ods[ci] = od
        nzm = (od != 0) & in_range
        nz_ref[0, ci] = nzm.sum(axis=-1)
        # Highest zig-zag position holding a nonzero (0 when none): with
        # `covered` this determines the cell's token count up front, so the
        # fused tokenize+compact kernel can precompute stream positions.
        ln_ref[0, ci] = jnp.max(jnp.where(nzm, lanes, 0), axis=-1)
    # Emission layout [cells..., channel, 128], channel order Y, X, B
    # (enc_group.cc:448): the tokenizer's emission rows come out as a free
    # reshape instead of a [G,3,32,32,128] channel transpose in HBM.
    ord_ref[0] = jnp.stack([ods[1], ods[0], ods[2]], axis=2)


def quantize_cells(
    coef8, coef_v, coef_h, strategy, raw_qf, fac_x, fac_b,
    scale, scale_dc, x_qm_mul,
):
    """coef8: [G,3,32,32,64]; coef_v: [G,3,16,32,128]; coef_h:
    [G,3,32,16,128]; strategy/raw_qf/fac_x/fac_b: [G,32,32].

    Returns (ordered_em [G,32,32,3,128] i32 zig-zag quantized coefficients
    in EMISSION layout — raster cells, channel order Y,X,B within a cell —
    nzeros_total [G,3,32,32] i32, qdc [G,3,2,32,32] i32 per-first-cell DC
    pairs, channel order X,Y,B, last_nz [G,3,32,32] i32 highest nonzero
    zig-zag position)."""
    g = coef8.shape[0]
    kern = functools.partial(
        _quant_kernel, scale=float(scale), scale_dc=float(scale_dc),
        x_qm_mul=float(x_qm_mul),
    )
    ordered, nz, qdc, lastnz = pl.pallas_call(
        kern,
        grid=(g, 4),
        in_specs=[
            pl.BlockSpec((1, 3, 8, 32, 64), lambda i, y: (i, 0, y, 0, 0)),
            pl.BlockSpec((1, 3, 4, 32, 128), lambda i, y: (i, 0, y, 0, 0)),
            pl.BlockSpec((1, 3, 8, 16, 128), lambda i, y: (i, 0, y, 0, 0)),
            pl.BlockSpec((1, 8, 32), lambda i, y: (i, y, 0)),
            pl.BlockSpec((1, 8, 32), lambda i, y: (i, y, 0)),
            pl.BlockSpec((1, 8, 32), lambda i, y: (i, y, 0)),
            pl.BlockSpec((1, 8, 32), lambda i, y: (i, y, 0)),
            pl.BlockSpec((3, 3, 128), lambda i, y: (0, 0, 0)),
            pl.BlockSpec((3, 3, 128), lambda i, y: (0, 0, 0)),
            pl.BlockSpec((3, 3, 128), lambda i, y: (0, 0, 0)),
            pl.BlockSpec((128, 128), lambda i, y: (0, 0)),
            pl.BlockSpec((128, 128), lambda i, y: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 32, 3, 128), lambda i, y: (i, y, 0, 0, 0)),
            pl.BlockSpec((1, 3, 8, 32), lambda i, y: (i, 0, y, 0)),
            pl.BlockSpec((1, 3, 2, 8, 32), lambda i, y: (i, 0, 0, y, 0)),
            pl.BlockSpec((1, 3, 8, 32), lambda i, y: (i, 0, y, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 32, 32, 3, 128), jnp.int32),
            jax.ShapeDtypeStruct((g, 3, 32, 32), jnp.int32),
            jax.ShapeDtypeStruct((g, 3, 2, 32, 32), jnp.int32),
            jax.ShapeDtypeStruct((g, 3, 32, 32), jnp.int32),
        ],
        interpret=_interpret(),
    )(
        coef8.reshape(g, 3, 32, 32, 64),
        coef_v,
        coef_h,
        strategy.astype(jnp.int32),
        raw_qf.astype(jnp.int32),
        fac_x.astype(jnp.float32),
        fac_b.astype(jnp.float32),
        jnp.asarray(_QM_TAB),
        jnp.asarray(_DQM_TAB),
        jnp.asarray(_THR_TAB),
        jnp.asarray(_ZZ_P8),
        jnp.asarray(_ZZ_P16),
    )
    return ordered, nz, qdc, lastnz
