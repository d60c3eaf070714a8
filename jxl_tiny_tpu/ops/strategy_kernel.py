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


def _estimate_kernel(
    c8_ref, cv_ref, ch_ref,
    q8_ref, qv_ref, qh_ref, m8_ref, mv_ref, mh_ref,
    f8_ref, fv_ref, fh_ref,
    qm8_ref, qm16_ref,
    o8_ref, ov_ref, oh_ref, *, slope,
):
    # One grid step per group: all three channels of each coefficient set
    # ride in one block (read once), the CfL term reads the in-block Y.
    for ci in range(3):
        qm8 = qm8_ref[ci : ci + 1, :]  # [1,64]
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

        ent, il2 = _family(
            c8_ref[0, ci], c8_ref[0, 1], qm8, q8_ref[0], m8_ref[0],
            cf_of(f8_ref), slope,
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
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 3, 32, 32, 64), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 16, 32, 128), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 3, 32, 16, 128), lambda i: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 16, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 16), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2, 32, 32), lambda i: (i, 0, 0, 0)),
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
        coef8.reshape(g, 3, 32, 32, 64).astype(jnp.float32),
        coef_v.astype(jnp.float32),
        coef_h.astype(jnp.float32),
        q8.astype(jnp.float32),
        qv.astype(jnp.float32),
        qh.astype(jnp.float32),
        m8.astype(jnp.float32),
        mv.astype(jnp.float32),
        mh.astype(jnp.float32),
        fac8.astype(jnp.float32),
        facv.astype(jnp.float32),
        fach.astype(jnp.float32),
        jnp.asarray(qm8, jnp.float32),
        jnp.asarray(qm16, jnp.float32),
    )


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
