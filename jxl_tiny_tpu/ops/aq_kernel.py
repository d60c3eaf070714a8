"""Adaptive-quant field as one Pallas TPU kernel (kernel Q).

The reference computes a per-8x8-block quant multiplier from psychovisual
heuristics (enc_adaptive_quantization.cc:376-534: 4x-subsampled local
difference map -> fuzzy erosion -> per-block mask/HF/color/gamma
modulations). The jnp form (pipeline_jax.adaptive_quant_field) runs as
~10 XLA passes over the [G,3,256,256] pixels (~4.5 ms/8MP on a v5e);
everything is group-local, so one kernel computes the whole field with a
single read of the group's XYB pixels.

Bit-equality contract: every float expression here mirrors the jnp twin
operation-for-operation (shared helpers are imported from pipeline_jax;
strided sums use the same pinned left-fold order via mid-axis reshapes;
the 3x3 erosion sort is an exact sorting network). Elementwise IEEE ops
round identically on every backend, so raw_qf stays bit-equal to the
numpy golden model (tested), with the same exp2/log2 caveats as the XLA
path on hardware.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pack_kernels import _interpret

F32 = np.float32


def _iotas(n):
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ri, ci


def _sh_up(p, ri):  # out[r] = p[r-1], edge-replicated
    n = p.shape[0]
    return jnp.where(ri == 0, p, pltpu.roll(p, 1, axis=0))


def _sh_down(p, ri):  # out[r] = p[r+1]
    n = p.shape[0]
    return jnp.where(ri == n - 1, p, pltpu.roll(p, n - 1, axis=0))


def _sh_left(p, ci):  # out[c] = p[c-1]
    return jnp.where(ci == 0, p, pltpu.roll(p, 1, axis=1))


def _sh_right(p, ci):  # out[c] = p[c+1]
    n = p.shape[1]
    return jnp.where(ci == n - 1, p, pltpu.roll(p, n - 1, axis=1))


def _fold_sub(a, n):
    """[R, C] -> [R/n, C]: left-fold sum of row-strided slices, the same
    add order as ref/pipeline_np._strided_sum(a, n, axis=0)."""
    r, c = a.shape
    a3 = a.reshape(r // n, n, c)
    s = a3[:, 0]
    for i in range(1, n):
        s = s + a3[:, i]
    return s


def _fold_lanes(a, n):
    """[R, C] -> [R, C/n]: left-fold sum of column-strided slices
    (= _strided_sum(a, n, axis=1)), via transposes so the grouping
    reshape stays on a major axis."""
    t = a.T  # [C, R]
    return _fold_sub(t, n).T


def _sort9(vs):
    """Exact ascending sort of 9 equal-shaped arrays (odd-even
    transposition network); returns the list sorted elementwise."""
    vs = list(vs)
    for rnd in range(9):
        start = rnd & 1
        for j in range(start, 8, 2):
            lo = jnp.minimum(vs[j], vs[j + 1])
            hi = jnp.maximum(vs[j], vs[j + 1])
            vs[j], vs[j + 1] = lo, hi
    return vs


def _aq_kernel(xyb_ref, val_ref, gamma_ref, mask_ref, *, distance, inv_scale):
    from .pipeline_jax import (
        _compute_mask, _masking_sqrt, _ratio_of_derivatives,
    )

    y_pl = xyb_ref[0, 1]
    x_pl = xyb_ref[0, 0]
    b_pl = xyb_ref[0, 2]
    ri, ci = _iotas(256)

    scale = F32(0.8294 / distance)
    gammac = _ratio_of_derivatives(y_pl + F32(0.019), invert=False)

    def diffsq(p):
        # Same add order as the jnp twin's pad-and-slice form:
        # (down + up) + left + right.
        base = 0.25 * (
            _sh_down(p, ri) + _sh_up(p, ri) + _sh_left(p, ci)
            + _sh_right(p, ci)
        )
        d = gammac * (p - base)
        return d * d

    diff = _masking_sqrt(diffsq(y_pl) + F32(23.426802998210313) * diffsq(x_pl))
    pre_erosion = _fold_sub(_fold_lanes(diff, 4), 4) * F32(0.25)  # [64,64]

    # FuzzyErosion: 3x3 neighborhood (edge-replicated), sum of the 4
    # smallest of the 9 values.
    ri64, ci64 = _iotas(64)

    def nb(dy, dx):
        p = pre_erosion
        if dy < 0:
            p = _sh_up(p, ri64)
        elif dy > 0:
            p = _sh_down(p, ri64)
        if dx < 0:
            p = _sh_left(p, ci64)
        elif dx > 0:
            p = _sh_right(p, ci64)
        return p

    neigh = _sort9([nb(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)])
    low4 = (neigh[0] + neigh[1]) + (neigh[2] + neigh[3])
    v = F32(0.05) * (pre_erosion + low4)
    aq = _fold_sub(_fold_lanes(v, 2), 2)  # [32,32]
    masking = 1.0 / (aq + F32(0.001))

    val = _compute_mask(aq)
    # HfModulation.
    right = jnp.abs(y_pl - _sh_right(y_pl, ci))
    right = right * (1.0 - (ci % 8 == 7).astype(jnp.float32))
    down = jnp.abs(y_pl - _sh_down(y_pl, ri))
    down = down * (1.0 - (ri % 8 == 7).astype(jnp.float32))

    def block_sums(a):  # pinned order: lanes(8) then rows(8)
        return _fold_sub(_fold_lanes(a, 8), 8)

    val = val + block_sums(right + down) * F32(-2.0052193233688884 / 112)
    # ColorModulation.
    strength = np.float32(2.177823400325309) * np.float32(1.0 - 0.25 * distance)
    if strength >= 0:
        red_slope = jnp.minimum(
            jnp.maximum(x_pl - F32(0.0073200141118951231), 0.0),
            F32(0.019421555948474039),
        )
        blue_slope = jnp.minimum(
            jnp.maximum(b_pl - (y_pl + F32(0.26973418507870539)), 0.0),
            F32(0.086890611400405895),
        )
        ratio = np.float32(30.610615782142737)
        red_cov = jnp.minimum(
            block_sums(red_slope), F32(ratio * 0.019421555948474039)
        )
        blue_cov = jnp.minimum(
            block_sums(blue_slope), F32(ratio * 0.086890611400405895)
        )
        val = (
            val
            + F32(strength * -0.009174542291185913)
            + red_cov * F32(strength * 5.992297772961519 / ratio)
            + blue_cov * F32(strength / ratio)
        )
    # GammaModulation's log2 and the final exp2 are NOT computed here:
    # Mosaic's exp2/log2 polynomials differ from XLA's by up to 58/2 ulp
    # (measured, tools/probe_op_exactness.py round 4), which flipped
    # knife-edge raw_qf cells vs the CPU-generated byte goldens. Every op
    # left in this kernel (arith, sqrt, div, FMA) is bit-exact across the
    # two compilers, so the [G,32,32] transcendental tail runs in XLA
    # (adaptive_quant_field epilogue) and hardware output is again
    # bit-equal to the jnp twin.
    r = (y_pl + F32(0.16)) - x_pl
    gch = (y_pl + F32(0.16)) + x_pl
    ratio_avg = 0.5 * (
        _ratio_of_derivatives(r, True) + _ratio_of_derivatives(gch, True)
    )
    val_ref[0] = val
    gamma_ref[0] = block_sums(ratio_avg)
    mask_ref[0] = masking


def adaptive_quant_field_kernel(xyb, distance, inv_scale):
    """[G,3,256,256] XYB -> (qf, masking [G,32,32] f32, raw_qf [G,32,32]
    i32) — the Pallas form of pipeline_jax.adaptive_quant_field. The
    kernel emits (val, gamma_block_sums, masking); the exp2/log2 tail runs
    here in XLA on the tiny [G,32,32] maps so the hardware result is
    bit-equal to the jnp twin (see the in-kernel note; Mosaic's exp2/log2
    round differently)."""
    g = xyb.shape[0]
    kern = functools.partial(
        _aq_kernel, distance=float(distance), inv_scale=float(inv_scale)
    )
    val, gamma_bs, masking = pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, 3, 256, 256), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 32, 32), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g, 32, 32), jnp.float32),
            jax.ShapeDtypeStruct((g, 32, 32), jnp.float32),
            jax.ShapeDtypeStruct((g, 32, 32), jnp.float32),
        ],
        interpret=_interpret(),
    )(xyb.astype(jnp.float32))
    scale = F32(0.8294 / distance)
    val = val + F32(-0.15526878023684174 * 0.693147180559945) * jnp.log2(
        gamma_bs * F32(1.0 / 64)
    )
    dampen = 1.0 if distance < 7.0 else max(0.0, 1.0 - (distance - 7.0) / 7.0)
    mul = F32(float(scale) * dampen)
    add = F32((1.0 - dampen) * 0.5 * float(scale))
    qf = jnp.exp2(val * F32(1.442695041)) * mul + add
    raw_qf = jnp.clip(
        (qf * F32(inv_scale) + F32(0.5)).astype(jnp.int32), 1, 255
    )
    # Barrier: pin this XLA tail's accumulation as a standalone segment so
    # its float results cannot vary with the surrounding program's batch
    # shape (XLA fuses it into shape-dependent consumers otherwise; see
    # the stage-seam note in pipeline_jax.to_xyb).
    return jax.lax.optimization_barrier((qf, masking, raw_qf))
