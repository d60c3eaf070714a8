"""Scaled DCT on TPU as dense matrix contractions.

TPU-first design note: instead of translating the reference's recursive
radix-2 DCT (enc_transforms-inl.h:289-480), the transform is expressed as
constant-matrix contractions which XLA maps onto the MXU. For a whole group
the per-axis transforms contract full 256-wide dimensions, keeping lanes full.
"""
import jax
import jax.numpy as jnp

from ..ref.dct_np import dct_matrix, dct16_half_mats


def _stable_pair_contract(sub, a, b, ma, mb):
    """einsum(a, ma) + einsum(b, mb) with each contraction pinned as a
    standalone dot by optimization barriers. Without the barriers XLA may
    fuse a contraction into its consumers with a batch-shape-dependent
    accumulation order — measured: the same group's quantized stream
    differed between a G=6 and a G=1 compilation of the full pipeline
    (one knife-edge coefficient), breaking shard-count byte invariance.
    Standalone, the K=8 HIGHEST dots are shape-stable (probed) and the
    final add is a single correctly-rounded op."""
    hi = jax.lax.Precision.HIGHEST
    pa = jax.lax.optimization_barrier(jnp.einsum(sub, a, ma, precision=hi))
    pb = jax.lax.optimization_barrier(jnp.einsum(sub, b, mb, precision=hi))
    return pa + pb


def dct16x8_from_8(c_top, c_bot):
    """jax twin of ref/dct_np.dct16x8_from_8 (bit-equal on CPU; the two
    K=8 HIGHEST contractions are the same accumulation class as dct2d's,
    which hardware byte-identity already relies on)."""
    a0, a1 = dct16_half_mats()
    return _stable_pair_contract(
        "...li,ki->...lk", c_top, c_bot, jnp.asarray(a0), jnp.asarray(a1)
    )


def dct8x16_from_8(c_left, c_right):
    """jax twin of ref/dct_np.dct8x16_from_8."""
    a0, a1 = dct16_half_mats()
    return _stable_pair_contract(
        "...jk,lj->...kl", c_left, c_right, jnp.asarray(a0), jnp.asarray(a1)
    )


def dct2d(pixels, r, c):
    """pixels: [..., R, C] -> coefficients [..., min, max] in reference layout
    (see ref/dct_np.py)."""
    dr = jnp.asarray(dct_matrix(r))
    dc = jnp.asarray(dct_matrix(c))
    # HIGHEST keeps the MXU passes f32-faithful: quantization decisions
    # feed off these values. Measured: lowering to HIGH (bf16x3) saves
    # nothing — these small-contraction matmuls are memory-bound, so the
    # extra passes are free — while costing cross-backend bit-identity.
    coef = jnp.einsum(
        "ky,...yx,lx->...kl", dr, pixels, dc, precision=jax.lax.Precision.HIGHEST
    )
    if r >= c:
        coef = jnp.swapaxes(coef, -2, -1)
    # Stage-seam barrier (see pipeline_jax.to_xyb): coefficients feed
    # quantize decisions and must be bitwise batch-shape-independent.
    return jax.lax.optimization_barrier(coef)
