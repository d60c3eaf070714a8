"""Batched TPU analysis pipeline: [G, 3, 256, 256] groups -> token arrays.

TPU-first rewrite of the per-group pipeline (numpy golden model in
jxl_tiny_tpu.ref): everything is batched over the group axis G — the sharding
axis for multi-chip encoding (jxl_tiny_tpu.parallel). Control flow is
compute-all-select: all candidate DCTs are computed for every cell and the
strategy decision masks select among them; no data-dependent shapes anywhere,
so XLA fuses the whole pipeline into a handful of kernels.

Stage semantics match jxl_tiny_tpu.ref.{pipeline_np,group_np} (tested against
them); reference citations live there.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import constants as C
from ..ref.group_np import _threshold_map
from .dct_jax import dct2d

F32 = np.float32  # host scalar constants (jnp.float32() builds device arrays)


# ---------------------------------------------------------------------------
# Constant tables (built once with numpy)
# ---------------------------------------------------------------------------


def _strategy_tables():
    qm = np.zeros((3, 3, 128), np.float32)  # [strategy, channel, coeff]
    dqm = np.zeros((3, 3, 128), np.float32)
    thr = np.zeros((3, 3, 128), np.float32)
    qm[C.DCT8, :, :64] = C.QUANT_DCT8.reshape(3, 64)
    dqm[C.DCT8, :, :64] = C.DEQUANT_DCT8.reshape(3, 64)
    qm[C.DCT16X8] = qm[C.DCT8X16] = C.QUANT_DCT16.reshape(3, 128)
    dqm[C.DCT16X8] = dqm[C.DCT8X16] = C.DEQUANT_DCT16.reshape(3, 128)
    for c in range(3):
        thr[C.DCT8, c, :64] = _threshold_map(c, 1, 1).ravel()
        thr[C.DCT16X8, c] = _threshold_map(c, 1, 2).ravel()
        thr[C.DCT8X16, c] = _threshold_map(c, 2, 1).ravel()
    order = np.zeros((3, 128), np.int32)
    order[C.DCT8] = np.concatenate([C.COEFF_ORDER8, 64 + np.arange(64)])
    order[C.DCT16X8] = order[C.DCT8X16] = C.COEFF_ORDER16
    return qm, dqm, thr, order


_QM_TAB, _DQM_TAB, _THR_TAB, _ORDER_TAB = _strategy_tables()

def _zigzag_permutations():
    """One-hot permutation matrices: ordered = quantized @ P (MXU-friendly
    replacement for per-element gathers)."""
    p8 = np.zeros((128, 128), np.float32)
    order8 = np.concatenate([C.COEFF_ORDER8, 64 + np.arange(64)])
    p8[order8, np.arange(128)] = 1.0
    p16 = np.zeros((128, 128), np.float32)
    p16[C.COEFF_ORDER16, np.arange(128)] = 1.0
    return p8, p16


_ZZ_P8, _ZZ_P16 = _zigzag_permutations()

# Lower-triangular (inclusive) ones matrix: prefix-sum-as-matmul operand.
_TRI_INCL_128 = np.tril(np.ones((128, 128), np.float32)).T


def _nnz_ctx_steps():
    """COEFF_NNZ_CTX as a monotone step function: lut[x] = sum of deltas at
    thresholds <= x (avoids a 64-entry gather with 50M indices)."""
    lut = C.COEFF_NNZ_CTX.astype(np.int64).copy()
    lut[0] = 0  # index 0 is never used (guarded by nzeros_left > 0)
    deltas = np.diff(lut)
    idx = np.nonzero(deltas)[0] + 1
    return idx.astype(np.int32), deltas[idx - 1].astype(np.int32)


_NNZ_THRESH, _NNZ_DELTA = _nnz_ctx_steps()

# Static freq-context tables per covered_blocks (k is a static position).
_FREQ_TAB = np.stack(
    [
        C.COEFF_FREQ_CTX[np.clip(np.arange(128) >> 0, 0, 63)],
        C.COEFF_FREQ_CTX[np.clip(np.arange(128) >> 1, 0, 63)],
    ]
).astype(np.int32)  # [2, 128]

# Block context per (strategy, channel): BLOCK_CTX_MAP[c, STRATEGY_CODE[s]].
_BLOCK_CTX_TAB = np.stack(
    [C.BLOCK_CTX_MAP[c, C.STRATEGY_CODE] for c in range(3)], axis=1
).astype(np.int32)  # [strategy, channel]


def _sel_by_strategy(strategy, t8, tv, th):
    """Select per-cell among three constants (no gathers)."""
    s = strategy[:, None, :, :, None]
    return jnp.where(s == C.DCT8, t8, jnp.where(s == C.DCT16X8, tv, th))


def _uint_token(v):
    """Hybrid-uint token id + extra bit count, arithmetically (v < 2^16)."""
    vi = v.astype(jnp.int32)
    vf = jnp.maximum(vi, 16).astype(jnp.float32)
    n = jnp.frexp(vf)[1] - 1  # floor(log2) exact for ints < 2^24
    tok_big = (n << 2) + ((vi >> jnp.maximum(n - 2, 0)) & 3)
    tok = jnp.where(vi < 16, vi, tok_big)
    nbits = jnp.where(vi < 16, 0, n - 2)
    return tok, nbits


# ---------------------------------------------------------------------------
# Shifts with edge clamping (pixel stencils)
# ---------------------------------------------------------------------------


def _shift(a, d, axis):
    """Clamped shift: out[i] = a[i + d] with edge replication."""
    if d == 0:
        return a
    take = [slice(None)] * a.ndim
    pad = [slice(None)] * a.ndim
    if d > 0:
        take[axis] = slice(d, None)
        pad[axis] = slice(-1, None)
        parts = [a[tuple(take)]] + [a[tuple(pad)]] * d
    else:
        take[axis] = slice(None, d)
        pad[axis] = slice(None, 1)
        parts = [a[tuple(pad)]] * (-d) + [a[tuple(take)]]
    return jnp.concatenate(parts, axis=axis)


def _shift0(a, d, axis):
    """Shift with zero fill."""
    if d == 0:
        return a
    z = jnp.zeros_like(a)
    take = [slice(None)] * a.ndim
    zs = [slice(None)] * a.ndim
    if d > 0:
        take[axis] = slice(d, None)
        zs[axis] = slice(0, d)
        return jnp.concatenate([a[tuple(take)], z[tuple(zs)]], axis=axis)
    take[axis] = slice(None, d)
    zs[axis] = slice(0, -d)
    return jnp.concatenate([z[tuple(zs)], a[tuple(take)]], axis=axis)


# ---------------------------------------------------------------------------
# Stages
# ---------------------------------------------------------------------------


def to_xyb(groups):
    """[G, 3, 256, 256] linear sRGB -> XYB (enc_xyb.cc:44-81).

    The 3x3 opsin mix is unrolled to elementwise f32 FMAs (one fused pass on
    the VPU) rather than an einsum: a K=3 contraction would otherwise run as
    multi-pass bf16 matmuls on the MXU for no benefit."""
    m = C.OPSIN_MATRIX
    r, g_, b = groups[:, 0], groups[:, 1], groups[:, 2]
    mixed = [
        m[i, 0] * r + m[i, 1] * g_ + m[i, 2] * b + C.OPSIN_BIAS
        for i in range(3)
    ]
    tm = [jnp.cbrt(jnp.maximum(v, 0.0)) + C.NEG_BIAS_CBRT for v in mixed]
    out = jnp.stack(
        [0.5 * (tm[0] - tm[1]), 0.5 * (tm[0] + tm[1]), tm[2]], axis=1
    )
    # Stage-seam barrier. Shard-count byte invariance demands that every
    # float feeding a quantize/strategy decision be bitwise identical for
    # ANY group-batch shape (G=1 per mesh shard vs G=135 single-chip).
    # Isolated, each stage's codegen is shape-stable (probed); fused into
    # different consumers XLA may contract FMAs differently per shape —
    # measured 1-ulp xyb drift between a G=6 and G=1 compilation of the
    # full pipeline, enough to flip one knife-edge coefficient on f16
    # input. The barrier pins the stage as its standalone form; the array
    # materializes here anyway (it feeds a Pallas kernel input).
    return jax.lax.optimization_barrier(out)


def _ratio_of_derivatives(v, invert):
    eps = F32(1e-2)
    v = jnp.maximum(v, 0.0)
    k_log2 = 0.693147181
    k_sg_mul = 226.0480446705883
    k_sg_ret_mul = (1.0 / 73.377132366608819) * 18.6580932135 * k_log2
    num_mul = F32(k_sg_ret_mul * 3 * k_sg_mul)
    v_offset = F32(7.14672470003 * k_log2 + 1e-2)
    den_mul = F32(k_log2 * k_sg_mul)
    v2 = v * v
    num = num_mul * v2 + eps
    den = den_mul * v * v2 + v_offset
    return num / den if invert else den / num


def _masking_sqrt(v):
    return F32(0.25) * jnp.sqrt(v * np.float32(np.sqrt(211.50759899638012e8)) + F32(26.481471032459346))


def _block_sums(a):
    # Pinned fold order (see ref/pipeline_np._strided_sum): bit-equal
    # across numpy / XLA / Pallas implementations.
    from ..ref.pipeline_np import _strided_sum

    return _strided_sum(_strided_sum(a, 8, 2), 8, 1)


def _compute_mask(v):
    v1 = jnp.maximum(v * F32(0.74760422233706747), F32(1e-3))
    v2 = 1.0 / (v1 + F32(305.04035728311436))
    v3 = 1.0 / (v1 * v1 + F32(2.1925739705298404))
    v4 = 1.0 / (v1 * v1 + F32(0.25 * 2.1925739705298404))
    return (
        F32(-0.74174993)
        + F32(3.2353257320940401) * v4
        + F32(12.906028311180409) * v2
        + F32(5.0220313103171232) * v3
    )


def adaptive_quant_field(xyb, distance, inv_scale):
    """[G,3,256,256] -> (qf, masking, raw_qf) [G,32,32].

    One Pallas pass over the group pixels (ops/aq_kernel); the jnp twin
    below is the reference model (bit-equal expressions, shared helpers)."""
    from .aq_kernel import adaptive_quant_field_kernel

    return adaptive_quant_field_kernel(xyb, distance, inv_scale)


def adaptive_quant_field_jnp(xyb, distance, inv_scale):
    """jnp twin of ops/aq_kernel (kept as the comparison model)."""
    g = xyb.shape[0]
    scale = F32(0.8294 / distance)
    y_pl = xyb[:, 1]
    x_pl = xyb[:, 0]
    gammac = _ratio_of_derivatives(y_pl + F32(0.019), invert=False)

    def diffsq(p):
        # One edge pad, four slices: slices of a single materialized pad
        # fuse into the consumer, where per-shift concatenates would each
        # materialize a full [G, 256, 256] copy.
        pp = jnp.pad(p, ((0, 0), (1, 1), (1, 1)), mode="edge")
        base = 0.25 * (
            pp[:, 2:, 1:-1] + pp[:, :-2, 1:-1] + pp[:, 1:-1, :-2] + pp[:, 1:-1, 2:]
        )
        d = gammac * (p - base)
        return d * d

    from ..ref.pipeline_np import _strided_sum

    diff = _masking_sqrt(diffsq(y_pl) + F32(23.426802998210313) * diffsq(x_pl))
    pre_erosion = _strided_sum(_strided_sum(diff, 4, 2), 4, 1) * F32(0.25)

    pe_pad = jnp.pad(pre_erosion, ((0, 0), (1, 1), (1, 1)), mode="edge")
    neigh = jnp.stack(
        [
            pe_pad[:, 1 + dy : 65 + dy, 1 + dx : 65 + dx]
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    neigh = jnp.sort(neigh, axis=0)
    low4 = (neigh[0] + neigh[1]) + (neigh[2] + neigh[3])
    v = F32(0.05) * (pre_erosion + low4)
    aq = _strided_sum(_strided_sum(v, 2, 2), 2, 1)
    masking = 1.0 / (aq + F32(0.001))

    val = _compute_mask(aq)
    # HfModulation.
    right = jnp.abs(y_pl - _shift(y_pl, 1, -1))
    right = right * (1.0 - _col_mask_last_of_8(256))
    down = jnp.abs(y_pl - _shift(y_pl, 1, -2))
    down = down * (1.0 - _row_mask_last_of_8(256))
    val = val + _block_sums(right + down) * F32(-2.0052193233688884 / 112)
    # ColorModulation.
    strength = np.float32(2.177823400325309) * np.float32(1.0 - 0.25 * distance)
    if strength >= 0:
        red_slope = jnp.minimum(
            jnp.maximum(xyb[:, 0] - F32(0.0073200141118951231), 0.0),
            F32(0.019421555948474039),
        )
        blue_slope = jnp.minimum(
            jnp.maximum(xyb[:, 2] - (xyb[:, 1] + F32(0.26973418507870539)), 0.0),
            F32(0.086890611400405895),
        )
        ratio = np.float32(30.610615782142737)
        red_cov = jnp.minimum(
            _block_sums(red_slope), F32(ratio * 0.019421555948474039)
        )
        blue_cov = jnp.minimum(
            _block_sums(blue_slope), F32(ratio * 0.086890611400405895)
        )
        val = (
            val
            + F32(strength * -0.009174542291185913)
            + red_cov * F32(strength * 5.992297772961519 / ratio)
            + blue_cov * F32(strength / ratio)
        )
    # GammaModulation.
    r = (xyb[:, 1] + F32(0.16)) - xyb[:, 0]
    gch = (xyb[:, 1] + F32(0.16)) + xyb[:, 0]
    ratio_avg = 0.5 * (
        _ratio_of_derivatives(r, True) + _ratio_of_derivatives(gch, True)
    )
    val = val + F32(-0.15526878023684174 * 0.693147180559945) * jnp.log2(
        _block_sums(ratio_avg) * F32(1.0 / 64)
    )

    dampen = 1.0 if distance < 7.0 else max(0.0, 1.0 - (distance - 7.0) / 7.0)
    mul = F32(float(scale) * dampen)
    add = F32((1.0 - dampen) * 0.5 * float(scale))
    qf = jnp.exp2(val * F32(1.442695041)) * mul + add
    raw_qf = jnp.clip(
        (qf * F32(inv_scale) + F32(0.5)).astype(jnp.int32), 1, 255
    )
    return qf, masking, raw_qf


@functools.lru_cache(maxsize=None)
def _col_mask_last_of_8_np(w):
    m = np.zeros((w,), np.float32)
    m[7::8] = 1.0
    return m


def _col_mask_last_of_8(w):
    return jnp.asarray(_col_mask_last_of_8_np(w))[None, None, :]


def _row_mask_last_of_8(h):
    return jnp.asarray(_col_mask_last_of_8_np(h))[None, :, None]


def _round_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def compute_cmap(coef8, valid_blocks):
    """coef8: [G,3,32,32,8,8]; valid_blocks: [G,32,32] bool -> ytox/ytob [G,4,4]."""
    g = coef8.shape[0]
    qm_x = jnp.asarray(C.QUANT_DCT8[0])
    qm_b = jnp.asarray(C.QUANT_DCT8[2])
    vb = valid_blocks[:, :, :, None, None]
    m_x = coef8[:, 1] * qm_x * vb
    s_x = coef8[:, 0] * qm_x * vb
    m_b = coef8[:, 1] * qm_b * vb
    s_b = coef8[:, 2] * qm_b * vb

    def tile_sum(a):  # [G,32,32,8,8] -> [G,4,4]
        return a.reshape(g, 4, 8, 4, 8, 64).sum(axis=(2, 4, 5))

    n = (
        valid_blocks.reshape(g, 4, 8, 4, 8).sum(axis=(2, 4)).astype(F32) * 64.0
    )  # [G,4,4]

    def fit(m, s, base):
        a = C.INV_COLOR_FACTOR * m
        b = base * m - s
        ca = tile_sum(a * a)
        cb = tile_sum(a * b)
        x = -cb / (ca + n * F32(1e-3 * 0.5) + F32(1e-30))
        return jnp.clip(_round_away(x), -128, 127).astype(jnp.int32)

    return fit(m_x, s_x, 0.0), fit(m_b, s_b, 1.0)


def _ceil_log2_nonzero(v):
    # Exact integer form (f32 exponent bitcast) — see
    # strategy_kernel._ceil_log2_nz for why jnp.log2 is avoided.
    vi = jnp.maximum(v, 1).astype(jnp.int32)
    n = (jax.lax.bitcast_convert_type(vi.astype(F32), jnp.int32) >> 23) - 127
    return n + (vi != (1 << n)).astype(jnp.int32)


def _estimate_entropy(coef, qm, q, masking, fac_x, fac_b, distance):
    """coef: [G,3,...,S]; qm: [3,S]; q/masking/fac_*: [G,...]. -> [G,...]."""
    num_blocks = coef.shape[-1] // 64
    cf = jnp.stack([fac_x, jnp.zeros_like(fac_x), fac_b], axis=1)  # [G,3,...]
    val = (coef - cf[..., None] * coef[:, 1:2]) * qm.reshape(
        (1, 3) + (1,) * (coef.ndim - 3) + (-1,)
    ) * q[:, None, ..., None]
    rval = jnp.round(val)
    diff = jnp.abs(val - rval)
    info_loss = diff.sum(axis=(1, -1))
    info_loss2 = (diff * diff).sum(axis=(1, -1))
    aq = jnp.abs(rval)
    nzeros = (aq != 0).sum(axis=-1)  # [G,3,...]
    slope = min(1.0, distance / 3.0)
    ent = (
        (aq >= 1.5).sum(axis=-1) * F32(4.4628149885273363)
        + jnp.sqrt(aq).sum(axis=-1) * F32(5.3359184934516337)
        + nzeros * F32(1.0 + slope * 8.8703248061477744)
    )
    nbits = _ceil_log2_nonzero(nzeros + 1) + 1
    ent = ent + F32(7.565053364251793) * (_ceil_log2_nonzero(nbits + 17) + nbits)
    entropy = ent.sum(axis=1)
    score = F32(138.0) * info_loss + F32(50.46839691767866) * jnp.sqrt(
        num_blocks * info_loss2
    )
    return entropy + masking * score


def compute_ac_strategy(
    xyb, coef8, qf, masking, ytox, ytob, distance, yb_valid, xb_valid
):
    """Returns (strategy [G,32,32] i32, is_first [G,32,32] bool,
    coef_v [G,3,16,32,128], coef_h [G,3,32,16,128])."""
    g = xyb.shape[0]
    qm8 = jnp.asarray(C.QUANT_DCT8.reshape(3, 64))
    qm16 = jnp.asarray(C.QUANT_DCT16.reshape(3, 128))

    # DCT16-family coefficient sets by recombination of the already-computed
    # 8x8 DCTs (dct_jax.dct16x8_from_8): one K=8 constant contraction per
    # half instead of fresh 16-point transforms of the pixel data — the
    # pixel re-reads, the blk_v/blk_h transposes, and the 16-point column
    # passes all disappear (VERDICT r4 task 1; reference recombines sizes
    # the same way via DCTResampleScales, dct_scales.h:42-74).
    from .dct_jax import dct16x8_from_8, dct8x16_from_8

    cpair = coef8.reshape(g, 3, 16, 2, 32, 8, 8)
    coef_v = dct16x8_from_8(cpair[:, :, :, 0], cpair[:, :, :, 1]).reshape(
        g, 3, 16, 32, 128
    )
    hpair = coef8.reshape(g, 3, 32, 16, 2, 8, 8)
    coef_h = dct8x16_from_8(hpair[:, :, :, :, 0], hpair[:, :, :, :, 1]).reshape(
        g, 3, 32, 16, 128
    )

    fac_x = (
        jnp.repeat(jnp.repeat(ytox.astype(F32), 8, 1), 8, 2) * C.INV_COLOR_FACTOR
    )  # [G,32,32]
    fac_b = 1.0 + jnp.repeat(jnp.repeat(ytob.astype(F32), 8, 1), 8, 2) * C.INV_COLOR_FACTOR

    mul8 = F32(1.0735757687292623 * 0.75 + (-0.55 * 0.75) / (distance + 1.4))
    mul16 = F32(0.9019587899705066 + (-0.55) / (distance + 1.6))

    # Vertical candidates: q/mask max over (2r, 2r+1); cf at top cell;
    # horizontal likewise over (2c, 2c+1). Even/odd via reshape (see the
    # quad-decision note below — strided slices gather on TPU).
    qf_r = qf.reshape(g, 16, 2, 32)
    mk_r = masking.reshape(g, 16, 2, 32)
    q_v = jnp.maximum(qf_r[:, :, 0], qf_r[:, :, 1])  # [G,16,32]
    m_v = jnp.maximum(mk_r[:, :, 0], mk_r[:, :, 1])
    qf_c = qf.reshape(g, 32, 16, 2)
    mk_c = masking.reshape(g, 32, 16, 2)
    q_h = jnp.maximum(qf_c[..., 0], qf_c[..., 1])  # [G,32,16]
    m_h = jnp.maximum(mk_c[..., 0], mk_c[..., 1])

    # All three candidate-entropy families in one Pallas pass over the
    # coefficient sets (ops/strategy_kernel; the jnp twin _estimate_entropy
    # is kept as the reference model). A round-4 variant moved the per-cell
    # reductions onto the MXU (grid (G,3), ones-vector dots): measured
    # SLOWER in whole-program context (13.0 vs 8.15 ms window-corrected,
    # tools/artifacts/profile_r04.md) and deleted — redundant Y-block reads
    # and latency-bound [R,S]x[S,1] dots beat the shuffle-reduce it saved.
    from .strategy_kernel import combine_partials, estimate_partials

    slope = min(1.0, distance / 3.0)
    p8, pv, ph = estimate_partials(
        coef8.reshape(g, 3, 32, 32, 64), coef_v, coef_h,
        qf, q_v, q_h,
        masking, m_v, m_h,
        jnp.stack([fac_x, fac_b], axis=1),
        jnp.stack(
            [fac_x.reshape(g, 16, 2, 32)[:, :, 0],
             fac_b.reshape(g, 16, 2, 32)[:, :, 0]], axis=1
        ),
        jnp.stack(
            [fac_x.reshape(g, 32, 16, 2)[..., 0],
             fac_b.reshape(g, 32, 16, 2)[..., 0]], axis=1
        ),
        qm8, qm16, slope,
    )
    e8_all = F32(3.0) * mul8 + mul8 * combine_partials(p8, masking, 1)
    ev_all = mul16 * combine_partials(pv, m_v, 2)
    eh_all = mul16 * combine_partials(ph, m_h, 2)

    # Quad decisions [G,16,16]. Even/odd extraction and re-interleave go
    # through reshape/stack (stablehlo.slice + concatenate): the former
    # strided-slice + .at[::2].set forms lowered to 16 gathers + 8
    # scatters, which serialize on TPU (~3 ms of the round-4 trace for
    # [G,16,16]-sized maps).
    r8 = e8_all.reshape(g, 16, 2, 16, 2)
    e00 = r8[:, :, 0, :, 0]
    e01 = r8[:, :, 0, :, 1]
    e10 = r8[:, :, 1, :, 0]
    e11 = r8[:, :, 1, :, 1]
    rv = ev_all.reshape(g, 16, 16, 2)
    ev_l = rv[..., 0]
    ev_r = rv[..., 1]
    rh = eh_all.reshape(g, 16, 2, 16)
    eh_t = rh[:, :, 0]
    eh_b = rh[:, :, 1]
    cost16x8 = jnp.minimum(ev_l, e00 + e10) + jnp.minimum(ev_r, e01 + e11)
    cost8x16 = jnp.minimum(eh_t, e00 + e01) + jnp.minimum(eh_b, e10 + e11)
    pick_v = cost16x8 < cost8x16

    qi = jnp.arange(16)
    quad_ok = (
        (2 * qi[None, :, None] + 2 <= yb_valid[:, None, None])
        & (2 * qi[None, None, :] + 2 <= xb_valid[:, None, None])
    )
    v_l = quad_ok & pick_v & (ev_l < e00 + e10)
    v_r = quad_ok & pick_v & (ev_r < e01 + e11)
    h_t = quad_ok & ~pick_v & (eh_t < e00 + e01)
    h_b = quad_ok & ~pick_v & (eh_b < e10 + e11)

    z16 = jnp.zeros((g, 16, 16), bool)
    row_even = jnp.stack([v_l, v_r], axis=-1).reshape(g, 16, 32)
    vfirst = jnp.stack(
        [row_even, jnp.zeros((g, 16, 32), bool)], axis=2
    ).reshape(g, 32, 32)
    row_t = jnp.stack([h_t, z16], axis=-1).reshape(g, 16, 32)
    row_b = jnp.stack([h_b, z16], axis=-1).reshape(g, 16, 32)
    hfirst = jnp.stack([row_t, row_b], axis=2).reshape(g, 32, 32)

    second_v = _shift0(vfirst, -1, -2)
    second_h = _shift0(hfirst, -1, -1)
    strategy = jnp.where(
        vfirst | second_v,
        C.DCT16X8,
        jnp.where(hfirst | second_h, C.DCT8X16, C.DCT8),
    ).astype(jnp.int32)
    is_first = ~(second_v | second_h)
    return strategy, is_first, coef_v, coef_h


def adjust_quant_field(strategy, is_first, raw_qf):
    vfirst = is_first & (strategy == C.DCT16X8)
    hfirst = is_first & (strategy == C.DCT8X16)
    m_v = jnp.maximum(raw_qf, _shift0(raw_qf, 1, -2))
    m_h = jnp.maximum(raw_qf, _shift0(raw_qf, 1, -1))
    out = jnp.where(vfirst, m_v, raw_qf)
    out = jnp.where(_shift0(vfirst, -1, -2), _shift0(m_v, -1, -2), out)
    out = jnp.where(hfirst, m_h, out)
    out = jnp.where(_shift0(hfirst, -1, -1), _shift0(m_h, -1, -1), out)
    return out


def _adjust_quant_bias(q, c):
    qf = q.astype(F32)
    bias = C.DEFAULT_QUANT_BIAS
    small = jnp.abs(qf) < 1.125
    one_bias = jnp.where(q == 0, 0.0, jnp.where(qf < 0, -bias[c], bias[c]))
    big = qf - F32(bias[3]) / jnp.where(q == 0, 1.0, qf)
    return jnp.where(small, one_bias, big)


def _dc_from_llf(coef, strat):
    """coef: [G,yb,xb,128]; strat: [G,yb,xb] -> [G,yb,xb,2]."""
    c0 = coef[..., 0]
    c1 = coef[..., 1] * C.DCT_SCALE_16_TO_2
    first = jnp.where(strat == C.DCT8, c0, c0 + c1)
    second = c0 - c1
    return jnp.stack([first, second], axis=-1)


def _scatter_covered(values, strat, is_first):
    """values: [G,yb,xb,2] per-first-cell -> [G,yb,xb] cell map."""
    vfirst = is_first & (strat == C.DCT16X8)
    hfirst = is_first & (strat == C.DCT8X16)
    out = jnp.where(is_first, values[..., 0], 0)
    out = jnp.where(_shift0(vfirst, -1, -2), _shift0(values[..., 1], -1, -2), out)
    out = jnp.where(_shift0(hfirst, -1, -1), _shift0(values[..., 1], -1, -1), out)
    return out


def _encode_middle(
    coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
    scale, scale_dc, x_qm_mul, first,
):
    """Fused quantize kernel (kernel F) + the cheap neighbor-dependent
    context math on [G,3,32,32] maps — the shared front of both device
    tokenization paths (tokenize_cells and the fused tokenize_compact)."""
    from .pack_kernels import base64_nz
    from .quantize_kernel import quantize_cells

    fac_x = (
        jnp.repeat(jnp.repeat(ytox.astype(F32), 8, 1), 8, 2)
        * C.INV_COLOR_FACTOR
    )
    fac_b = 1.0 + jnp.repeat(
        jnp.repeat(ytob.astype(F32), 8, 1), 8, 2
    ) * C.INV_COLOR_FACTOR
    ordered, nzeros_total, qdcp, lastnz = quantize_cells(
        coef8, coef_v, coef_h, strategy, raw_qf, fac_x, fac_b,
        scale, scale_dc, x_qm_mul,
    )
    quant_dc = jnp.stack(
        [
            _scatter_covered(
                qdcp[:, c].transpose(0, 2, 3, 1), strategy, is_first
            )
            for c in range(3)
        ],
        axis=1,
    )  # [G,3,32,32]
    covered = jnp.where(strategy == C.DCT8, 1, 2)
    shifted_nz = -(-nzeros_total // jnp.maximum(covered[:, None], 1))
    nz_map = jnp.stack(
        [
            _scatter_covered(
                jnp.stack([shifted_nz[:, c]] * 2, -1), strategy, is_first
            )
            for c in range(3)
        ],
        axis=1,
    )  # [G,3,32,32]
    top = _shift0(nz_map, -1, -2)
    left = _shift0(nz_map, -1, -1)
    by_i = jnp.arange(32)[:, None]
    bx_i = jnp.arange(32)[None, :]
    pred = jnp.where(
        (by_i == 0) & (bx_i == 0),
        32,
        jnp.where(
            by_i == 0,
            left,
            jnp.where(bx_i == 0, top, (top + left + 1) // 2),
        ),
    )
    bct = _BLOCK_CTX_TAB
    block_ctx = _sel_by_strategy(
        strategy,
        jnp.asarray(bct[C.DCT8])[None, :, None, None, None],
        jnp.asarray(bct[C.DCT16X8])[None, :, None, None, None],
        jnp.asarray(bct[C.DCT8X16])[None, :, None, None, None],
    )[..., 0]  # [G,3,32,32]
    nz_bucket = jnp.where(
        pred < 8, pred, jnp.where(pred >= 64, 36, 4 + pred // 2)
    )
    nzero_ctx = base64_nz(nz_bucket, block_ctx)
    shp = nzeros_total.shape
    size_b = jnp.broadcast_to((covered * 64)[:, None], shp)
    prev_init = (nzeros_total <= (size_b >> 4)).astype(jnp.int32)
    # `ordered` is in EMISSION layout [G,32,32,3,128] (kernel F writes it
    # that way — see quantize_cells); all other maps stay channel-major.
    return dict(
        ordered=ordered,
        nzeros_total=nzeros_total,
        lastnz=lastnz,
        covered=covered,
        block_ctx=block_ctx,
        nzero_ctx=nzero_ctx,
        prev_init=prev_init,
        quant_dc=quant_dc,
        nz_map=nz_map,
    )


_EMIT_CHAN = np.array([1, 0, 2])  # emission channel order Y, X, B


def encode_groups_stream(
    coef8,
    coef_v,
    coef_h,
    strategy,
    is_first,
    raw_qf,
    ytox,
    ytob,
    scale,
    scale_dc,
    x_qm_mul,
    valid,
    cap,
):
    """Flagship tokenization: kernel F + context middle + tokenize_cells
    kernel -> merge_rows + compact (pack_kernels.compact_stream).

    A fused single-kernel route (tokenize_compact) existed through round 3
    behind JXL_TOKENIZE_FUSED; it lost the hardware A/B at every tested
    scale (G=16/135/512, tools/artifacts/ab_fused_r04.json) and was
    deleted in round 4 — see tokenize_kernel's module docstring.

    Returns (stream [G, cap+128] u32, totals [G] i32, quant_dc
    [G,3,32,32] i32)."""
    import os

    from .pack_kernels import compact_stream, compact_stream_hier
    from .tokenize_kernel import tokenize_cells

    g = coef8.shape[0]
    first = is_first & valid
    m = _encode_middle(
        coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
        scale, scale_dc, x_qm_mul, first,
    )
    shp = m["nzeros_total"].shape
    covered_b = jnp.broadcast_to(m["covered"][:, None], shp)
    first_b = jnp.broadcast_to(first[:, None], shp)
    chan = jnp.asarray(_EMIT_CHAN)

    def em(a):  # small [G,3,32,32] map -> emission order [G,32,32,3]
        return a[:, chan].transpose(0, 2, 3, 1)

    ordered_em = m["ordered"]  # already emission-ordered (kernel F)
    tokens_em, _ = tokenize_cells(
        ordered_em, em(covered_b), em(m["nzeros_total"]),
        em(m["block_ctx"]), em(m["nzero_ctx"]), em(m["prev_init"]),
        em(first_b),
    )
    # Per-cell token counts directly from kernel F's lastnz (highest
    # in-range nonzero zig-zag position): the last valid coefficient
    # token sits at slot lastnz - covered + 1, so the count needs no
    # reduction over the fat token array (tokenize_cells' own count —
    # a max over [*, 128] lanes of a 212 MB array — is DCE'd by XLA
    # since this route ignores it). Integer-identical to that reduction:
    # valid slots are exactly 1 .. lastnz - covered + 1 (nz_left > 0
    # holds through the last nonzero, inclusive).
    count_em = jnp.where(
        em(first_b),
        1 + jnp.maximum(em(m["lastnz"]) - em(covered_b) + 1, 0),
        0,
    )
    # Hierarchical (thin-first) compaction is the default; the classic
    # single-width path stays selectable for A/B (JXL_COMPACT_HIER=0) and
    # remains the word-packer's engine.
    compact = (
        compact_stream
        if os.environ.get("JXL_COMPACT_HIER", "1") == "0"
        else compact_stream_hier
    )
    stream, totals = compact(
        tokens_em.reshape(g, -1, 128), count_em.reshape(g, -1), cap
    )
    return stream, totals, m["quant_dc"]


def encode_groups(
    xyb,
    coef8,
    coef_v,
    coef_h,
    strategy,
    is_first,
    raw_qf,
    ytox,
    ytob,
    scale,
    scale_dc,
    x_qm_mul,
    valid,
    base_ctx=False,
):
    """Fused quantize + tokenize (mirrors ref/group_np.py encode_group).

    Returns tokens [G,32,32,3,64] u32, counts [G,32,32,3] i32,
    quant_dc [G,3,32,32] i32, nzeros map [G,3,32,32] i32.

    With base_ctx=True tokens carry the structured base-64 context cluster
    (pack_kernels.ac_base64_map) instead of the full 1980-context id — the
    form consumed by the device entropy-packing path.
    """
    g = xyb.shape[0]
    scale = F32(scale)
    first = is_first & valid

    if base_ctx:
        # Flagship path: the quantize front-end is one fused Pallas pass
        # (ops/quantize_kernel) and the per-coefficient tokenization tail
        # another (ops/tokenize_kernel); only the cheap neighbor-dependent
        # context math on [G,3,32,32] maps stays in jnp between them.
        from .tokenize_kernel import tokenize_cells

        m = _encode_middle(
            coef8, coef_v, coef_h, strategy, is_first, raw_qf, ytox, ytob,
            scale, scale_dc, x_qm_mul, first,
        )
        shp = m["nzeros_total"].shape
        # kernel F emits `ordered` in emission layout; this legacy route's
        # consumers expect channel-major tokens — transpose back here
        # (_EMIT_CHAN is its own inverse).
        chan = jnp.asarray(_EMIT_CHAN)
        ordered_cm = m["ordered"].transpose(0, 3, 1, 2, 4)[:, chan]
        tokens_full, count_full = tokenize_cells(
            ordered_cm,
            jnp.broadcast_to(m["covered"][:, None], shp),
            m["nzeros_total"],
            m["block_ctx"],
            m["nzero_ctx"],
            m["prev_init"],
            jnp.broadcast_to(first[:, None], shp),
        )
        return tokens_full, count_full, m["quant_dc"], m["nz_map"]

    coef8p = jnp.concatenate(
        [coef8.reshape(g, 3, 32, 32, 64), jnp.zeros((g, 3, 32, 32, 64), F32)], -1
    )
    coef_v_exp = jnp.repeat(coef_v, 2, axis=2)  # [G,3,32,32,128]
    coef_h_exp = jnp.repeat(coef_h, 2, axis=3)
    st = strategy[:, None, :, :, None]
    coefs = jnp.where(
        st == C.DCT8, coef8p, jnp.where(st == C.DCT16X8, coef_v_exp, coef_h_exp)
    )

    def tab_sel(tab):  # [strategy, channel, 128] -> [G, 3, 32, 32, 128]
        return _sel_by_strategy(
            strategy,
            jnp.asarray(tab[C.DCT8])[None, :, None, None, :],
            jnp.asarray(tab[C.DCT16X8])[None, :, None, None, :],
            jnp.asarray(tab[C.DCT8X16])[None, :, None, None, :],
        )

    qm = tab_sel(_QM_TAB)
    dqm = tab_sel(_DQM_TAB)
    thr = tab_sel(_THR_TAB)

    covered = jnp.where(strategy == C.DCT8, 1, 2)
    quant = raw_qf.astype(F32)
    qac = scale * quant  # [G,32,32]

    # Y quantize + roundtrip. Quantizers saturate at the alphabet's value
    # range (C.AC_COEF_CLAMP / C.DC_VALUE_CLAMP, constants/__init__.py).
    clamp = F32(C.AC_COEF_CLAMP)
    dclamp = F32(C.DC_VALUE_CLAMP)
    valy = coefs[:, 1] * qm[:, 1] * qac[..., None]
    qy = jnp.clip(
        jnp.where(jnp.abs(valy) >= thr[:, 1], jnp.round(valy), 0.0),
        -clamp, clamp,
    ).astype(jnp.int32)
    y_deq = _adjust_quant_bias(qy, 1) * dqm[:, 1] * (1.0 / (scale * quant))[..., None]

    inv_factor = C.INV_DC_QUANT * np.float32(scale_dc)
    dc_y = _dc_from_llf(coefs[:, 1], strategy)
    qdc_y = jnp.clip(
        _round_away(dc_y * F32(inv_factor[1])), -dclamp, dclamp
    ).astype(jnp.int32)

    fac_x = (
        jnp.repeat(jnp.repeat(ytox.astype(F32), 8, 1), 8, 2) * C.INV_COLOR_FACTOR
    )
    fac_b = 1.0 + jnp.repeat(jnp.repeat(ytob.astype(F32), 8, 1), 8, 2) * C.INV_COLOR_FACTOR
    coef_x = coefs[:, 0] - fac_x[..., None] * y_deq
    coef_b = coefs[:, 2] - fac_b[..., None] * y_deq

    valx = coef_x * qm[:, 0] * (qac * F32(x_qm_mul))[..., None]
    qx = jnp.clip(
        jnp.where(jnp.abs(valx) >= thr[:, 0], jnp.round(valx), 0.0),
        -clamp, clamp,
    ).astype(jnp.int32)
    valb = coef_b * qm[:, 2] * qac[..., None]
    qb = jnp.clip(
        jnp.where(jnp.abs(valb) >= thr[:, 2], jnp.round(valb), 0.0),
        -clamp, clamp,
    ).astype(jnp.int32)

    cfl_b = np.float32(C.INV_DC_QUANT[2] * C.DC_QUANT[1])
    qdc_x = jnp.clip(
        _round_away(_dc_from_llf(coef_x, strategy) * F32(inv_factor[0])),
        -dclamp, dclamp,
    ).astype(jnp.int32)
    qdc_b = jnp.clip(
        _round_away(
            _dc_from_llf(coef_b, strategy) * F32(inv_factor[2]) - qdc_y * cfl_b
        ),
        -dclamp, dclamp,
    ).astype(jnp.int32)

    quant_dc = jnp.stack(
        [
            _scatter_covered(qdc_x, strategy, is_first),
            _scatter_covered(qdc_y, strategy, is_first),
            _scatter_covered(qdc_b, strategy, is_first),
        ],
        axis=1,
    )  # [G,3,32,32]

    quantized = jnp.stack([qx, qy, qb], axis=1)  # [G,3,32,32,128]

    # --- Tokenization ---
    # Zig-zag reorder as one-hot matmuls (MXU) instead of per-element gathers.
    qf32 = quantized.astype(F32)
    o8 = jnp.einsum(
        "...j,jk->...k", qf32, jnp.asarray(_ZZ_P8), precision=jax.lax.Precision.HIGHEST
    )
    o16 = jnp.einsum(
        "...j,jk->...k", qf32, jnp.asarray(_ZZ_P16), precision=jax.lax.Precision.HIGHEST
    )
    cov2 = (covered > 1)[:, None, :, :, None]  # [G,1,32,32,1]
    ordered = jnp.where(cov2, o16, o8).astype(jnp.int32)
    size = covered * 64
    k_idx = jnp.arange(128)
    in_range = (k_idx >= covered[..., None]) & (k_idx < size[..., None])  # [G,32,32,128]
    nonzero = (ordered != 0) & in_range[:, None]
    nzeros_total = nonzero.sum(axis=-1)  # [G,3,32,32]
    shifted_nz = -(-nzeros_total // jnp.maximum(covered[:, None], 1))

    nz_map = jnp.stack(
        [
            _scatter_covered(
                jnp.stack([shifted_nz[:, c]] * 2, -1), strategy, is_first
            )
            for c in range(3)
        ],
        axis=1,
    )  # [G,3,32,32]

    top = _shift0(nz_map, -1, -2)
    left = _shift0(nz_map, -1, -1)
    by_i = jnp.arange(32)[:, None]
    bx_i = jnp.arange(32)[None, :]
    pred = jnp.where(
        (by_i == 0) & (bx_i == 0),
        32,
        jnp.where(
            by_i == 0,
            left,
            jnp.where(bx_i == 0, top, (top + left + 1) // 2),
        ),
    )

    # Block context via 3-way select (no gathers).
    bct = _BLOCK_CTX_TAB  # [strategy, channel]
    block_ctx = _sel_by_strategy(
        strategy,
        jnp.asarray(bct[C.DCT8])[None, :, None, None, None],
        jnp.asarray(bct[C.DCT16X8])[None, :, None, None, None],
        jnp.asarray(bct[C.DCT8X16])[None, :, None, None, None],
    )[..., 0]  # [G,3,32,32]
    nz_bucket = jnp.where(pred < 8, pred, jnp.where(pred >= 64, 36, 4 + pred // 2))
    if base_ctx:
        from .pack_kernels import base64_nz

        nzero_ctx = base64_nz(nz_bucket, block_ctx)  # [G,3,32,32]
    else:
        nzero_ctx = nz_bucket * C.NUM_BLOCK_CTXS + block_ctx  # [G,3,32,32]

    # Inclusive prefix count of nonzeros as ONE triangular bf16 matmul on the
    # MXU (counts <= 128 are exact in the f32 accumulator) instead of
    # lax.cumsum's 7 log-shift passes over the 212 MB token-lane array.
    nz_f = jnp.where(in_range[:, None], nonzero, False).astype(jnp.bfloat16)
    cum_nz = jnp.einsum(
        "...k,kj->...j",
        nz_f,
        jnp.asarray(_TRI_INCL_128).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    nz_left = nzeros_total[..., None] - cum_nz + jnp.where(
        in_range[:, None], nonzero, False
    )
    prev_nonzero = _shift0(nonzero.astype(jnp.int32), -1, -1)
    first_pos = k_idx == covered[:, None, :, :, None]
    prev_init = (nzeros_total <= (size[:, None] >> 4)).astype(jnp.int32)
    prev = jnp.where(first_pos, prev_init[..., None], prev_nonzero)

    # Zero-density context: COEFF_NNZ_CTX as a monotone step function and the
    # position context from a static per-covered table — both gather-free.
    nzl_shift = -(-nz_left // jnp.maximum(covered[:, None, ..., None], 1))
    nnz_part = jnp.zeros_like(nzl_shift)
    for t, d in zip(_NNZ_THRESH.tolist(), _NNZ_DELTA.tolist()):
        nnz_part = nnz_part + jnp.where(nzl_shift >= t, d, 0)
    freq_part = jnp.where(
        cov2, jnp.asarray(_FREQ_TAB[1]), jnp.asarray(_FREQ_TAB[0])
    )  # [G,1,32,32,128]
    if base_ctx:
        from .pack_kernels import base64_zd

        coeff_ctx = base64_zd(nnz_part + freq_part, prev, block_ctx[..., None])
    else:
        zd_ctx = (nnz_part + freq_part) * 2 + prev
        zd_offset = (
            C.NUM_BLOCK_CTXS * C.NONZERO_BUCKETS
            + C.ZERO_DENSITY_CONTEXT_COUNT * block_ctx
        )
        coeff_ctx = zd_offset[..., None] + zd_ctx  # [G,3,32,32,128]

    tok_valid = in_range[:, None] & (nz_left > 0) & first[:, None, :, :, None]
    coeff_val = _pack_signed(ordered)

    # Fixed-layout token array: slot 0 = nzeros token, slot t>=1 = order
    # position covered + t - 1. The source shift is 0 (covered=1) or 1
    # (covered=2): a static slice select, not a gather.
    def shift_sel(a, fill):
        sh = jnp.concatenate([a[..., 1:], jnp.full_like(a[..., :1], fill)], -1)
        return jnp.where(cov2, sh, a)

    ctx_g = shift_sel(coeff_ctx, 0)
    val_g = shift_sel(coeff_val, 0)
    valid_g = shift_sel(tok_valid, False)
    slot0_off = jnp.zeros((128,), bool).at[0].set(True)
    valid_g = valid_g & ~slot0_off

    packed = (ctx_g.astype(jnp.uint32) << 16) | val_g.astype(jnp.uint32)
    nz_token = (nzero_ctx.astype(jnp.uint32) << 16) | nzeros_total.astype(jnp.uint32)
    tokens_full = jnp.where(valid_g, packed, 0)
    tokens_full = jnp.where(slot0_off, nz_token[..., None], tokens_full)
    slot_idx = jnp.arange(128)
    last_valid = jnp.max(
        jnp.where(valid_g, slot_idx, 0), axis=-1
    )  # 0 when no coeff tokens
    count_full = jnp.where(first[:, None], 1 + last_valid, 0)  # [G,3,32,32]
    return tokens_full, count_full, quant_dc, nz_map


def split_token_cells(tokens_full, count_full, strategy, is_first, valid):
    """Per-cell 64-slot token layout (the numpy golden model's output form;
    used by the host-compatible path and the tests)."""
    first = is_first & valid
    tf = tokens_full.transpose(0, 2, 3, 1, 4)  # [G,32,32,3,128]
    cf = count_full.transpose(0, 2, 3, 1)  # [G,32,32,3]
    vfirst = first & (strategy == C.DCT16X8)
    hfirst = first & (strategy == C.DCT8X16)
    tokens = jnp.where(first[..., None, None], tf[..., :64], 0)
    counts = jnp.where(first[..., None], jnp.minimum(cf, 64), 0)
    cont_v = _shift0(tf[..., 64:], -1, 1)  # continuation cell is one row below
    cont_h = _shift0(tf[..., 64:], -1, 2)
    sec_v = _shift0(vfirst, -1, 1)
    sec_h = _shift0(hfirst, -1, 2)
    tokens = jnp.where(sec_v[..., None, None], cont_v, tokens)
    tokens = jnp.where(sec_h[..., None, None], cont_h, tokens)
    counts = jnp.where(
        sec_v[..., None], jnp.maximum(_shift0(cf, -1, 1) - 64, 0), counts
    )
    counts = jnp.where(
        sec_h[..., None], jnp.maximum(_shift0(cf, -1, 2) - 64, 0), counts
    )
    return tokens, counts


def compact_token_stream(tokens_full, count_full, cap):
    """Emission-ordered per-group token stream, on device.

    tokens_full: [G,3,32,32,128] u32; count_full: [G,3,32,32].
    Returns (stream [G, cap] u32, totals [G] i32). Order matches the
    reference's WriteACGroup emission: raster over first cells, channels
    Y, X, B, the transform's full token sequence per channel.

    Implemented as the *inverse* mapping (for each output position, binary-
    search the owning run and gather) — cap-many gathers instead of a
    54M-element scatter, which XLA serializes catastrophically on TPU.
    Tokens never leave the device in their fat layout — only this stream does.
    """
    g = tokens_full.shape[0]
    chan = jnp.array([1, 0, 2])  # emission channel order Y, X, B
    rows_tok = (
        tokens_full[:, chan].transpose(0, 2, 3, 1, 4).reshape(g, 32 * 32 * 3, 128)
    )
    rows_cnt = count_full[:, chan].transpose(0, 2, 3, 1).reshape(g, -1)
    ends = jnp.cumsum(rows_cnt, axis=1)
    totals = ends[:, -1].astype(jnp.int32)
    starts = ends - rows_cnt
    pos = jnp.arange(cap)
    r = jax.vmap(lambda e: jnp.searchsorted(e, pos, side="right"))(ends)
    r = jnp.minimum(r, rows_cnt.shape[1] - 1)
    slot = pos[None, :] - jnp.take_along_axis(starts, r, axis=1)
    slot = jnp.clip(slot, 0, 127)
    val = jnp.take_along_axis(rows_tok.reshape(g, -1), r * 128 + slot, axis=1)
    stream = jnp.where(pos[None, :] < totals[:, None], val, 0)
    return stream, totals


def token_histogram(tokens_full, count_full):
    """[G,3,32,32,128] tokens -> AC histogram [1980, 64] u32 (order-invariant
    integer sum => identical for any sharding)."""
    t_idx = jnp.arange(128)
    valid = t_idx < count_full[..., None]
    ctx = (tokens_full >> 16).astype(jnp.int32)
    val = (tokens_full & 0xFFFF).astype(jnp.int32)
    tok, _ = _uint_token(val)
    flat = (ctx * C.ALPHABET_SIZE + tok).ravel()
    hist = jnp.zeros(C.NUM_AC_CONTEXTS * C.ALPHABET_SIZE, jnp.uint32)
    hist = hist.at[flat].add(valid.ravel().astype(jnp.uint32), mode="drop")
    return hist.reshape(C.NUM_AC_CONTEXTS, C.ALPHABET_SIZE)


def _pack_signed(v):
    v = v.astype(jnp.int32)
    return jnp.where(v >= 0, 2 * v, -2 * v - 1).astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("distance", "inv_scale", "scale", "scale_dc", "x_qm_mul")
)
def analyze_groups_jax(
    groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul
):
    """groups: [G,3,256,256] f32 linear sRGB (edge-padded);
    yb_valid/xb_valid: [G] i32 valid block dims.

    Returns dict of per-group outputs (see encode_groups).
    """
    g = groups.shape[0]
    xyb = to_xyb(groups)
    qf, masking, raw_qf = adaptive_quant_field(xyb, distance, inv_scale)

    blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef8 = dct2d(blocks8, 8, 8)  # [G,3,32,32,8,8]

    by_i = jnp.arange(32)[:, None]
    bx_i = jnp.arange(32)[None, :]
    valid = (by_i[None] < yb_valid[:, None, None]) & (
        bx_i[None] < xb_valid[:, None, None]
    )

    ytox, ytob = compute_cmap(coef8, valid)
    strategy, is_first, coef_v, coef_h = compute_ac_strategy(
        xyb, coef8, qf, masking, ytox, ytob, distance, yb_valid, xb_valid
    )
    raw_qf = adjust_quant_field(strategy, is_first, raw_qf)
    tokens_full, count_full, quant_dc, nz_map = encode_groups(
        xyb,
        coef8,
        coef_v,
        coef_h,
        strategy,
        is_first,
        raw_qf,
        ytox,
        ytob,
        scale,
        scale_dc,
        x_qm_mul,
        valid,
    )
    tokens, counts = split_token_cells(
        tokens_full, count_full, strategy, is_first, valid
    )
    return dict(
        tokens=tokens,
        counts=counts,
        quant_dc=quant_dc,
        strategy=strategy,
        is_first=is_first,
        raw_qf=raw_qf,
        ytox=ytox,
        ytob=ytob,
    )


def extract_groups_device(image):
    """[3, H, W] -> [G, 3, 256, 256] edge-replicated group tiles, on device.

    Matches CopyAndPadImage semantics (enc_frame.cc:597-617): padding pixels
    replicate the last valid row/column.

    uint8 input is interpreted as sRGB-encoded samples and linearized on
    device (IEC 61966-2-1 EOTF). 8-bit uploads ride the host<->device link at
    a quarter of f32's bytes — and most photographic sources are 8-bit sRGB
    to begin with, so this ingest path adds no loss for them.

    A [2, 3, H, W] u8 input is byte-plane-split float16 (hi plane, lo
    plane; see encoder._split_f16_planes): the hi-byte plane is smooth, so
    link-level transport compression gets ~20% more out of the same bytes.
    """
    if image.ndim == 4:  # byte-plane f16
        hi = image[0].astype(jnp.uint16)
        lo = image[1].astype(jnp.uint16)
        image = jax.lax.bitcast_convert_type(
            ((hi << 8) | lo).astype(jnp.uint16), jnp.float16
        )
    _, h, w = image.shape
    gh = -(-h // 256) * 256
    gw = -(-w // 256) * 256
    if image.dtype == jnp.uint8:
        x = image.astype(F32) * F32(1.0 / 255.0)
        image = jnp.where(
            x <= F32(0.04045),
            x * F32(1.0 / 12.92),
            jnp.exp(F32(2.4) * jnp.log(jnp.maximum((x + F32(0.055)) * F32(1.0 / 1.055), 1e-7))),
        )
    else:
        image = image.astype(F32)  # f16 uploads are converted on device
    img = jnp.pad(image, ((0, 0), (0, gh - h), (0, gw - w)), mode="edge")
    img = img.reshape(3, gh // 256, 256, gw // 256, 256)
    return img.transpose(1, 3, 0, 2, 4).reshape(-1, 3, 256, 256)


@functools.partial(
    jax.jit,
    static_argnames=("distance", "inv_scale", "scale", "scale_dc", "x_qm_mul", "cap"),
)
def analyze_image_fast(
    image, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul, cap
):
    """Whole-image fast path: tiling happens on device; upload only [3,H,W]."""
    groups = extract_groups_device(image)
    return _analyze_groups_fast_impl(
        groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul, cap
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance",
        "inv_scale",
        "scale",
        "scale_dc",
        "x_qm_mul",
        "cap",
    ),
)
def analyze_groups_fast(
    groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul, cap
):
    """Transfer-lean variant: tokens stay on device; outputs are the compact
    emission-ordered stream, AC histograms, and the small per-block maps."""
    return _analyze_groups_fast_impl(
        groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul, cap
    )


def _analyze_groups_fast_impl(
    groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc, x_qm_mul, cap
):
    g = groups.shape[0]
    groups = groups.astype(F32)
    xyb = to_xyb(groups)
    qf, masking, raw_qf = adaptive_quant_field(xyb, distance, inv_scale)
    blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef8 = dct2d(blocks8, 8, 8)
    by_i = jnp.arange(32)[:, None]
    bx_i = jnp.arange(32)[None, :]
    valid = (by_i[None] < yb_valid[:, None, None]) & (
        bx_i[None] < xb_valid[:, None, None]
    )
    ytox, ytob = compute_cmap(coef8, valid)
    strategy, is_first, coef_v, coef_h = compute_ac_strategy(
        xyb, coef8, qf, masking, ytox, ytob, distance, yb_valid, xb_valid
    )
    raw_qf = adjust_quant_field(strategy, is_first, raw_qf)
    tokens_full, count_full, quant_dc, _ = encode_groups(
        xyb,
        coef8,
        coef_v,
        coef_h,
        strategy,
        is_first,
        raw_qf,
        ytox,
        ytob,
        scale,
        scale_dc,
        x_qm_mul,
        valid,
    )
    stream, totals = compact_token_stream(tokens_full, count_full, cap)
    return dict(
        stream=stream,
        totals=totals,
        quant_dc=quant_dc.astype(jnp.int16),
        strategy=strategy.astype(jnp.uint8),
        is_first=is_first,
        raw_qf=raw_qf.astype(jnp.uint8),
        ytox=ytox.astype(jnp.int8),
        ytob=ytob.astype(jnp.int8),
    )


def _pack_meta_u8(quant_dc, raw_qf, strategy, is_first, ytox, ytob):
    """Pack the small per-group host-side maps into one u8 buffer [G, 8224]
    so they cross the device->host link as a single transfer (the link has
    ~25ms per-transfer latency in tunneled setups)."""
    g = quant_dc.shape[0]
    qdc = jax.lax.bitcast_convert_type(
        quant_dc.astype(jnp.int16), jnp.uint8
    ).reshape(g, -1)
    qf = raw_qf.astype(jnp.uint8).reshape(g, -1)
    sf = (
        strategy.astype(jnp.uint8) | (is_first.astype(jnp.uint8) << 7)
    ).reshape(g, -1)
    yx = jax.lax.bitcast_convert_type(ytox.astype(jnp.int8), jnp.uint8).reshape(g, -1)
    yb_ = jax.lax.bitcast_convert_type(ytob.astype(jnp.int8), jnp.uint8).reshape(g, -1)
    return jnp.concatenate([qdc, qf, sf, yx, yb_], axis=1)


META_BYTES = 3 * 32 * 32 * 2 + 32 * 32 + 32 * 32 + 16 + 16


def unpack_meta_u8(meta):
    """Numpy inverse of _pack_meta_u8. meta: [G, META_BYTES] u8."""
    g = meta.shape[0]
    o = 0
    qdc = (
        np.ascontiguousarray(meta[:, o : o + 6144])
        .view(np.int16)
        .reshape(g, 3, 32, 32)
    )
    o += 6144
    qf = meta[:, o : o + 1024].reshape(g, 32, 32)
    o += 1024
    sf = meta[:, o : o + 1024].reshape(g, 32, 32)
    o += 1024
    ytox = np.ascontiguousarray(meta[:, o : o + 16]).view(np.int8).reshape(g, 4, 4)
    o += 16
    ytob = np.ascontiguousarray(meta[:, o : o + 16]).view(np.int8).reshape(g, 4, 4)
    return dict(
        quant_dc=qdc,
        raw_qf=qf,
        strategy=(sf & 0x7F).astype(np.uint8),
        is_first=(sf >> 7).astype(bool),
        ytox=ytox,
        ytob=ytob,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance",
        "inv_scale",
        "scale",
        "scale_dc",
        "x_qm_mul",
        "cap",
        "cfl",
        "blocks",
    ),
)
def analyze_image_packed(
    image,
    yb_valid,
    xb_valid,
    distance,
    inv_scale,
    scale,
    scale_dc,
    x_qm_mul,
    cap,
    cfl=True,
    blocks=True,
):
    """Device program A of the flagship path: whole image -> device-resident
    emission-ordered token stream (base-64 contexts) + base histograms + the
    packed per-group host maps. Only `hist`, `totals`, and `meta` are meant
    to cross the link; `stream` stays resident and feeds pack_ac_sections.

    cfl / blocks: capability tiers (common.EncoderConfig) — computed
    chroma-from-luma and 16x8/8x16 DCT selection; off mirrors the reference
    built with OPTIMIZE_CHROMA_FROM_LUMA=0 / OPTIMIZE_BLOCK_SIZES=0."""
    groups = extract_groups_device(image)
    out = analyze_groups_packed(
        groups, yb_valid, xb_valid, distance, inv_scale, scale, scale_dc,
        x_qm_mul, cap, cfl, blocks, return_maps=True,
    )
    maps = out.pop("_maps")
    dc_layout, dchist = dc_layout_from_maps(
        *maps, ysize=image.shape[-2], xsize=image.shape[-1]
    )
    out["dc_layout"] = dc_layout
    out["hists"] = jnp.concatenate([out.pop("hist")[None], dchist[None]])
    return out


def analyze_groups_packed(
    groups,
    yb_valid,
    xb_valid,
    distance,
    inv_scale,
    scale,
    scale_dc,
    x_qm_mul,
    cap,
    cfl=True,
    blocks=True,
    return_maps=False,
):
    """Group-batch core of program A (see analyze_image_packed). Per-group
    data parallel throughout — the unit parallel.sharding shard_maps over a
    device mesh (the group axis is the codec's only distribution dimension,
    enc_frame.cc:714-715,837-838)."""
    from .pack_kernels import hist_base64

    g = groups.shape[0]
    groups = groups.astype(F32)
    xyb = to_xyb(groups)
    qf, masking, raw_qf = adaptive_quant_field(xyb, distance, inv_scale)
    blocks8 = xyb.reshape(g, 3, 32, 8, 32, 8).transpose(0, 1, 2, 4, 3, 5)
    coef8 = dct2d(blocks8, 8, 8)
    by_i = jnp.arange(32)[:, None]
    bx_i = jnp.arange(32)[None, :]
    valid = (by_i[None] < yb_valid[:, None, None]) & (
        bx_i[None] < xb_valid[:, None, None]
    )
    if cfl:
        ytox, ytob = compute_cmap(coef8, valid)
    else:
        ytox = jnp.zeros((g, 4, 4), jnp.int32)
        ytob = jnp.zeros((g, 4, 4), jnp.int32)
    if blocks:
        strategy, is_first, coef_v, coef_h = compute_ac_strategy(
            xyb, coef8, qf, masking, ytox, ytob, distance, yb_valid, xb_valid
        )
        raw_qf = adjust_quant_field(strategy, is_first, raw_qf)
    else:
        strategy = jnp.zeros((g, 32, 32), jnp.int32)
        is_first = jnp.ones((g, 32, 32), bool)
        coef_v = jnp.zeros((g, 3, 16, 32, 128), F32)
        coef_h = jnp.zeros((g, 3, 32, 16, 128), F32)
    stream, totals, quant_dc = encode_groups_stream(
        coef8,
        coef_v,
        coef_h,
        strategy,
        is_first,
        raw_qf,
        ytox,
        ytob,
        scale,
        scale_dc,
        x_qm_mul,
        valid,
        cap,
    )
    hist = hist_base64(stream[:, :cap], jnp.minimum(totals, cap))
    meta = _pack_meta_u8(quant_dc, raw_qf, strategy, is_first, ytox, ytob)
    out = dict(stream=stream, totals=totals, hist=hist, meta=meta)
    if return_maps:
        out["_maps"] = (quant_dc, raw_qf, strategy, is_first, ytox, ytob)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "distance",
        "inv_scale",
        "scale",
        "scale_dc",
        "x_qm_mul",
        "cap",
        "cfl",
        "blocks",
    ),
)
def analyze_batch_packed(
    images,
    yb_valid,
    xb_valid,
    distance,
    inv_scale,
    scale,
    scale_dc,
    x_qm_mul,
    cap,
    cfl=True,
    blocks=True,
):
    """Batched program A: N same-sized images in one device program — one
    upload and one histogram download for the whole batch (per-image
    entropy codes and codestreams). The production serving path for
    small-image batches, where per-image link round-trips would dominate.

    images: [N, 3, H, W]; yb_valid/xb_valid: [N*G] (per image, concatenated).
    Returns dict(stream [N*G, cap+128], totals [N*G], hists [N, 2, 64, 64],
    dc_layout [N*Gd, DC_CAP])."""
    n = images.shape[0]
    groups = jax.vmap(extract_groups_device)(images)  # [N, G, 3, 256, 256]
    g_per = groups.shape[1]
    out = analyze_groups_packed(
        groups.reshape((-1,) + groups.shape[2:]),
        yb_valid,
        xb_valid,
        distance,
        inv_scale,
        scale,
        scale_dc,
        x_qm_mul,
        cap,
        cfl,
        blocks,
        return_maps=True,
    )
    maps = out.pop("_maps")
    from .pack_kernels import hist_base64

    # Per-image AC histograms.
    stream = out["stream"]
    totals = out["totals"]
    ac_hists = jax.vmap(lambda s, t: hist_base64(s[:, :cap], jnp.minimum(t, cap)))(
        stream.reshape(n, g_per, -1), totals.reshape(n, g_per)
    )  # [N, 64, 64]
    # Per-image DC layouts, vectorized over the image axis (one traced
    # instance regardless of batch size).
    from .dc_kernels import dc_hist

    layout = dc_layout_from_maps(
        *maps, ysize=images.shape[-2], xsize=images.shape[-1], n_images=n,
        with_hist=False,
    )[0]
    gd_per = layout.shape[0] // n
    dc_hists = jax.vmap(dc_hist)(layout.reshape(n, gd_per, -1))
    out.pop("hist")
    out.pop("meta")
    out["hists"] = jnp.stack([ac_hists, dc_hists], axis=1)  # [N, 2, 64, 64]
    out["dc_layout"] = layout
    return out


def dc_layout_from_maps(
    quant_dc, raw_qf, strategy, is_first, ytox, ytob, ysize, xsize,
    n_images=1, with_hist=True,
):
    """Per-group maps -> device DC-section layout (+ DC histogram).

    ysize/xsize: static per-image pixel dims (group grid geometry derives
    statically). Maps may hold n_images same-sized images' groups
    concatenated; the regrouping is vmapped over the image axis.
    Returns (dc_layout [n*Gd, DC_CAP] u32, dc_hist [64, 64] u32 or None)."""
    from ..common import div_ceil
    from . import dc_kernels as DK

    ygr = div_ceil(ysize, 256)
    xgr = div_ceil(xsize, 256)
    ygr_p = div_ceil(ygr, 8) * 8
    xgr_p = div_ceil(xgr, 8) * 8

    def regroup(a, trailing):
        # [n*G, ...] raster per image -> padded planes [n*Gd, ...]
        a = a.reshape((n_images, ygr, xgr) + a.shape[1:])
        a = jnp.pad(
            a,
            ((0, 0), (0, ygr_p - ygr), (0, xgr_p - xgr))
            + ((0, 0),) * (a.ndim - 3),
        )
        a = a.reshape((n_images, ygr_p * xgr_p) + a.shape[3:])
        out = jax.vmap(lambda x: DK.regroup_dc(x, ygr_p, xgr_p, trailing))(a)
        return out.reshape((-1,) + out.shape[2:])

    qdc = regroup(quant_dc.astype(jnp.int32), True)
    qf = regroup(raw_qf.astype(jnp.int32), False)
    st = regroup(strategy.astype(jnp.int32), False)
    fi = regroup(is_first.astype(jnp.int32), False).astype(bool)
    yx = regroup(ytox.astype(jnp.int32), False)
    yb_ = regroup(ytob.astype(jnp.int32), False)

    # Static per-DC-group valid dims (enc_frame.cc:48-93 geometry).
    ydg, xdg = div_ceil(ysize, 2048), div_ceil(xsize, 2048)
    ydb = np.zeros(ydg * xdg, np.int32)
    xdb = np.zeros(ydg * xdg, np.int32)
    tyv = np.zeros(ydg * xdg, np.int32)
    txv = np.zeros(ydg * xdg, np.int32)
    nbv = np.zeros(ydg * xdg, np.int32)
    i = 0
    for dy in range(ydg):
        for dx in range(xdg):
            ydb[i] = div_ceil(min(2048, ysize - dy * 2048), 8)
            xdb[i] = div_ceil(min(2048, xsize - dx * 2048), 8)
            tyv[i] = div_ceil(ydb[i] * 8, 64)
            txv[i] = div_ceil(xdb[i] * 8, 64)
            nbv[i] = int(ydb[i] * xdb[i] - 1).bit_length()
            i += 1
    # The padded grid may contain more (empty) DC groups than the image has
    # only when ygr_p/8 > ydg — impossible: ydg == ygr_p//8 by construction.
    layout = DK.build_dc_layout(
        qdc, qf, st, fi, yx, yb_,
        jnp.asarray(np.tile(ydb, n_images)), jnp.asarray(np.tile(xdb, n_images)),
        jnp.asarray(np.tile(tyv, n_images)), jnp.asarray(np.tile(txv, n_images)),
        jnp.asarray(np.tile(nbv, n_images)),
    )
    return layout, (DK.dc_hist(layout) if with_hist else None)


def make_analyze_fn():
    """Returns an encoder-driver analyze function backed by the jitted batch
    pipeline (single-group batches; see encoder.encode_image_jax for the
    batched path)."""
    from ..encoder import GroupResult, _extract_group
    from ..common import div_ceil
    from ..ref.group_np import GroupTokens

    def analyze(img, gx, gy, distp):
        _, h, w = img.shape
        gw = min(256, w - gx * 256)
        gh = min(256, h - gy * 256)
        xb, yb = div_ceil(gw, 8), div_ceil(gh, 8)
        patch = _extract_group(img, gx, gy)[None]
        out = analyze_groups_jax(
            jnp.asarray(patch),
            jnp.array([yb], jnp.int32),
            jnp.array([xb], jnp.int32),
            distance=float(distp.distance),
            inv_scale=float(distp.inv_scale),
            scale=float(distp.scale),
            scale_dc=float(distp.scale_dc),
            x_qm_mul=float(distp.x_qm_mul),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
        ty, tx = div_ceil(yb, 8), div_ceil(xb, 8)
        gt = GroupTokens(
            tokens=out["tokens"][0],
            counts=out["counts"][0],
            quant_dc=out["quant_dc"][0].astype(np.int16),
            nzeros=None,
        )
        return GroupResult(
            gt,
            out["strategy"][0].astype(np.uint8),
            out["is_first"][0],
            out["raw_qf"][0].astype(np.uint8),
            out["ytox"][0, :ty, :tx].astype(np.int8),
            out["ytob"][0, :ty, :tx].astype(np.int8),
            yb,
            xb,
        )

    return analyze
