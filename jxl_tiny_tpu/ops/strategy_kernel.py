"""AC-strategy entropy estimates as one Pallas TPU kernel (kernel E).

The reference scores every aligned 16x16 quad by estimating the token
entropy of 4xDCT8 vs 2xDCT16X8 vs 2xDCT8X16 (enc_ac_strategy.cc:51-146,
167-238: quantize-estimate + info-loss). The jnp form (`_estimate_entropy`
in pipeline_jax) ran as ~15 XLA passes over the three [G,3,...,S]
coefficient sets, materializing `val`/`rval`/`diff` intermediates in HBM
(~7 ms/8MP on a v5e). Everything is local to one cell's coefficient row,
so one kernel computes all three families' per-channel partial sums with
a single read of each coefficient set:

  - grid (G, 3): one group x one channel per step; the Y coefficients ride
    as second blocks of the same arrays (index maps pin channel 1) for the
    CfL-unapply term, so no cross-channel dependence remains
  - per-channel quant-matrix rows are selected by the channel grid index
    in the BlockSpec index map (no in-kernel gather)
  - outputs are per-channel partials (ent, info_loss, info_loss2) per
    cell; the cheap distance-dependent combine, masking multiply, and
    quad argmin stay in XLA on [G,32,32] maps (compute_ac_strategy)

Float lane-reductions here may round differently from the XLA twin on
another backend; strategy decisions are quality-heuristic choices and any
outcome is a valid stream (the CPU suite runs this kernel in interpret
mode where it matches the jnp twin's arithmetic exactly).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pack_kernels import _interpret

F32 = np.float32

# enc_ac_strategy.cc:51-146 cost constants (shared with the jnp twin).
K_ABOVE15 = F32(4.4628149885273363)
K_SQRT = F32(5.3359184934516337)
K_NZ_BASE = F32(1.0)
K_NZ_SLOPE = F32(8.8703248061477744)
K_NBITS = F32(7.565053364251793)


def _ceil_log2_nz(v):
    """Exact integer ceil(log2(max(v,1))) as f32 — arithmetic only.

    jnp.log2 is 1-2 ulp off in Mosaic vs XLA (tools/probe_op_exactness.py),
    which can flip the ceil at exact powers of two and silently change
    strategy decisions between hardware and the CPU goldens. The f32
    exponent bitcast is exact for ints < 2^24 on every backend."""
    vi = jnp.maximum(v, 1).astype(jnp.int32)
    vf = vi.astype(jnp.float32)
    n = (jax.lax.bitcast_convert_type(vf, jnp.int32) >> 23) - 127
    return (n + (vi != (1 << n)).astype(jnp.int32)).astype(jnp.float32)


K_IL = F32(138.0)


def _family(coef_c, coef_y, qm, q, m, cf, slope):
    """Per-cell partial sums for one (family, channel).

    coef_c/coef_y: [..., S] f32; qm: [S] f32 broadcastable; q/m/cf: [...]
    f32 cell maps (m = the per-cell masking this family combines with).
    Returns (ent, il2) each [...].

    Lane reductions dominate this kernel (each sum over S is ~2*log2(S)
    full-width roll+add passes), so the five per-channel sums of the jnp
    twin are folded into three: the three entropy terms and the
    masking-weighted info-loss (masking * 138 * diff — a linear term of
    the final combine, so it can ride inside the same summand) share ONE
    reduction; nzeros (needed exactly, for the nbits terms) and the
    squared info-loss (nonlinear in the combine: sqrt of the channel sum)
    keep their own. Same mathematical quantities as the twin up to float
    summation order (~1 ulp; strategy decisions are heuristic picks and
    the twin-equality test allows ULP drift)."""
    val = (coef_c - cf[..., None] * coef_y) * qm * q[..., None]
    rval = jnp.round(val)
    diff = jnp.abs(val - rval)
    il2 = (diff * diff).sum(axis=-1)
    aq = jnp.abs(rval)
    nz = aq != 0
    e = (
        jnp.where(aq >= F32(1.5), K_ABOVE15, F32(0.0))
        + jnp.sqrt(aq) * K_SQRT
        + nz.astype(jnp.float32) * F32(1.0 + slope * float(K_NZ_SLOPE))
        + (m * K_IL)[..., None] * diff
    )
    esum = e.sum(axis=-1)
    nzeros = nz.sum(axis=-1)
    nbits = _ceil_log2_nz(nzeros + 1) + 1.0
    ent = esum + K_NBITS * (_ceil_log2_nz(nbits.astype(jnp.int32) + 17) + nbits)
    return ent, il2


def _family8_packed(coef_c, coef_y, qm128, q_p, m_p, cf_p, slope):
    """The 8x8 family with two cells packed per 128-lane row (the flat
    [32,32,64] coefficient array re-viewed as [32,16,128] — a free
    reshape): full lane utilization for the elementwise chain, which
    dominates the kernel. The reductions are two 64-lane half slices
    summed separately — the same shape and tree order as the unpacked
    `_family` sums, so interpret (CPU) and Mosaic agree with the jnp
    twin exactly; Mosaic rejects the lane-interleaving [32,16,2]->[32,32]
    shape cast, so the halves are emitted side by side (even cells in
    lanes 0:16, odd in 16:32) and un-permuted in XLA by the caller.

    coef_c/coef_y: [32,16,128]; qm128: [1,128] (qm8 tiled); q_p/m_p/cf_p:
    [32,16,128] per-half-broadcast cell maps. Returns (ent, il2) each
    [32,32] in half-blocked cell order (even16 | odd16)."""
    val = (coef_c - cf_p * coef_y) * qm128 * q_p
    rval = jnp.round(val)
    diff = jnp.abs(val - rval)
    aq = jnp.abs(rval)
    nz = aq != 0
    e = (
        jnp.where(aq >= F32(1.5), K_ABOVE15, F32(0.0))
        + jnp.sqrt(aq) * K_SQRT
        + nz.astype(jnp.float32) * F32(1.0 + slope * float(K_NZ_SLOPE))
        + (m_p * K_IL) * diff
    )

    def halves(x):  # [32,16,128] -> [32,32] (even16 | odd16 per row)
        return jnp.concatenate(
            [x[..., :64].sum(axis=-1), x[..., 64:].sum(axis=-1)], axis=-1
        )

    esum = halves(e)
    il2 = halves(diff * diff)
    nzeros = halves(nz.astype(jnp.float32)).astype(jnp.int32)
    nbits = _ceil_log2_nz(nzeros + 1) + 1.0
    ent = esum + K_NBITS * (_ceil_log2_nz(nbits.astype(jnp.int32) + 17) + nbits)
    return ent, il2


def _pair_bcast(e_map, o_map):
    """[32,16] even/odd cell maps -> [32,16,128] per-half broadcast."""
    return jnp.concatenate(
        [
            jnp.broadcast_to(e_map[..., None], (32, 16, 64)),
            jnp.broadcast_to(o_map[..., None], (32, 16, 64)),
        ],
        axis=-1,
    )


def _estimate_kernel(
    c8_ref, cv_ref, ch_ref,
    q8e_ref, q8o_ref, qv_ref, qh_ref, m8e_ref, m8o_ref, mv_ref, mh_ref,
    f8e_ref, f8o_ref, fv_ref, fh_ref,
    qm8_ref, qm16_ref,
    o8_ref, ov_ref, oh_ref, *, slope,
):
    # One grid step per group: all three channels of each coefficient set
    # ride in one block (read once), the CfL term reads the in-block Y.
    q8_p = _pair_bcast(q8e_ref[0], q8o_ref[0])
    m8_p = _pair_bcast(m8e_ref[0], m8o_ref[0])
    for ci in range(3):
        qm8 = qm8_ref[ci : ci + 1, :]  # [1,64]
        qm128 = jnp.concatenate([qm8, qm8], axis=-1)  # [1,128]
        qm16 = qm16_ref[ci : ci + 1, :]  # [1,128]

        def cf_of(f_ref):
            f = f_ref[0]
            # cf = fac_x for X (0), 0 for Y (1), fac_b for B (2); the fac
            # blocks carry (fac_x, fac_b) stacked on axis 0.
            if ci == 0:
                return f[0]
            if ci == 2:
                return f[1]
            return jnp.zeros_like(f[0])

        if ci == 1:
            cf8_p = jnp.zeros((32, 16, 128), jnp.float32)
        else:
            cf8_p = _pair_bcast(
                cf_of(f8e_ref), cf_of(f8o_ref)
            )
        ent, il2 = _family8_packed(
            c8_ref[0, ci], c8_ref[0, 1], qm128, q8_p, m8_p, cf8_p, slope,
        )
        o8_ref[0, ci, 0] = ent
        o8_ref[0, ci, 1] = il2

        ent, il2 = _family(
            cv_ref[0, ci], cv_ref[0, 1], qm16, qv_ref[0], mv_ref[0],
            cf_of(fv_ref), slope,
        )
        ov_ref[0, ci, 0] = ent
        ov_ref[0, ci, 1] = il2

        ent, il2 = _family(
            ch_ref[0, ci], ch_ref[0, 1], qm16, qh_ref[0], mh_ref[0],
            cf_of(fh_ref), slope,
        )
        oh_ref[0, ci, 0] = ent
        oh_ref[0, ci, 1] = il2


def estimate_partials(
    coef8, coef_v, coef_h, q8, qv, qh, m8, mv, mh, fac8, facv, fach,
    qm8, qm16, slope,
):
    """coef8: [G,3,32,32,64]; coef_v: [G,3,16,32,128]; coef_h:
    [G,3,32,16,128]; q8/qv/qh: [G,32,32]/[G,16,32]/[G,32,16] quant maps;
    m8/mv/mh: the matching masking maps (folded into the entropy partial,
    see _family); fac8/facv/fach: [G,2,...] stacked (fac_x, fac_b) cell
    maps; qm8/qm16: [3,64]/[3,128] inverse-quant weights.

    Returns (p8 [G,3,2,32,32], pv [G,3,2,16,32], ph [G,3,2,32,16]) f32 —
    axis 1 = channel, axis 2 = (ent + masking*138*info_loss, info_loss2)
    partials."""
    g = coef8.shape[0]
    kern = functools.partial(_estimate_kernel, slope=float(slope))

    def eo(a):  # [..., 32] cell map -> even/odd x pair maps [..., 16]
        r = a.astype(jnp.float32).reshape(a.shape[:-1] + (16, 2))
        return r[..., 0], r[..., 1]

    q8e, q8o = eo(q8)
    m8e, m8o = eo(m8)
    f8e, f8o = eo(fac8)
    p8, pv, ph = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 3, 32, 16, 128), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 16, 32, 128), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 32, 16, 128), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, 32, 16), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, 32, 16), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, 16, 32), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2, 32, 16), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((3, 64), lambda i: (0, 0)),
            pl.BlockSpec((3, 128), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 3, 2, 32, 32), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 2, 16, 32), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 2, 32, 16), lambda i: (i, 0, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 3, 2, 32, 32), jnp.float32),
            jax.ShapeDtypeStruct((g, 3, 2, 16, 32), jnp.float32),
            jax.ShapeDtypeStruct((g, 3, 2, 32, 16), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        coef8.reshape(g, 3, 32, 16, 128).astype(jnp.float32),
        coef_v.astype(jnp.float32),
        coef_h.astype(jnp.float32),
        q8e, q8o,
        qv.astype(jnp.float32),
        qh.astype(jnp.float32),
        m8e, m8o,
        mv.astype(jnp.float32),
        mh.astype(jnp.float32),
        f8e, f8o,
        facv.astype(jnp.float32),
        fach.astype(jnp.float32),
        jnp.asarray(qm8, jnp.float32),
        jnp.asarray(qm16, jnp.float32),
    )
    # Un-permute the 8x8 family from half-blocked (even16 | odd16) to
    # raster bx order: full[2j + h] = out[16h + j]. Tiny [G,3,2,32,32]
    # array; XLA fuses this into the consumer.
    p8 = (
        p8.reshape(g, 3, 2, 32, 2, 16)
        .swapaxes(-1, -2)
        .reshape(g, 3, 2, 32, 32)
    )
    return p8, pv, ph


def combine_partials(p, masking, num_blocks):
    """(ent + masking*138*il, il2) per-channel partials [G,3,2,...] +
    masking [G,...] -> estimate map [G,...] (the tail of
    pipeline_jax._estimate_entropy; the 138*il term already rode inside
    the kernel's entropy partial)."""
    entropy = p[:, :, 0].sum(axis=1)
    il2 = p[:, :, 1].sum(axis=1)
    return entropy + masking * (
        F32(50.46839691767866) * jnp.sqrt(num_blocks * il2)
    )
