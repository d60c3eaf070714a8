"""Scaled DCT on TPU as dense matrix contractions.

TPU-first design note: instead of translating the reference's recursive
radix-2 DCT (enc_transforms-inl.h:289-480), the transform is expressed as
constant-matrix contractions which XLA maps onto the MXU. For a whole group
the per-axis transforms contract full 256-wide dimensions, keeping lanes full.
"""
import jax
import jax.numpy as jnp

from ..ref.dct_np import dct_matrix


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
    return coef
